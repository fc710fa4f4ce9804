"""Round-11 optional item #8: x10 rows for the four streaming sweep
sleepers, under a floor-decomposed protocol.

The four entries (stream_sessionization, stream_stream_join,
stream_stream_left_outer, stream_incremental_embedding_index) are
flagged by the sweep on walls that are dominated by PER-EXECUTION
machinery a resident stream pays once: micro-batch engine start
(measured per-execution via bench.measure_stream_startup), state
store + memory-sink init, and temp-warehouse setup.  The honest
x10 evidence is therefore: measure each wall at sf0.1 AND x10
(10x the event/vector volume) in one session — if the wall is
machinery, it barely moves; the marginal data cost
(wall_x10 - wall_sf01) / 9 is what a resident stream pays per
additional sf0.1 of data.

DuckDB oracle runs are included where the oracle is scale-valid
(oracle_scale_guard); the embedding index's banked-plane oracle has
a registered knee below x10 vectors, so its x10 row is Spark-only.

Usage: python tools/stream_sleepers_r11.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

TARGETS = [
    "stream_sessionization",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_incremental_embedding_index",
]

POINTS = {"sf0.1": "/root/testdata/sf0.1", "x10": "/tmp/scale_r09/x10"}
N_RUNS = 3


def main() -> None:
    from parity import duck_connection

    import bench
    from energi_data_pipeline_spark.queries import (load_all,
                                                    oracle_scale_guard)
    from energi_data_pipeline_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/stream_sleepers_r11.json"
    spark = get_spark("stream-sleepers-r11")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = load_all()
    startup = round(bench.measure_stream_startup(spark), 3)
    result: dict = {"loadavg_at_start": list(os.getloadavg()),
                    "stream_engine_startup_s": startup,
                    "sections": {}}
    for label, sf_dir in POINTS.items():
        # a missing scale point or one failing target must not
        # discard the other targets / the earlier section (the
        # round-10 rehearsal lost a 25-min sweep this way)
        if not Path(sf_dir).exists():
            result["sections"][label] = {"err": f"missing {sf_dir}"}
            Path(out_path).write_text(json.dumps(result, indent=1))
            continue
        cons = duck_connection(sf_dir)
        rows = {}
        for n in TARGETS:
            # warm the code path at the small sibling
            try:
                reg[n].fn(spark, "/root/testdata/sf0.01") \
                    .write.format("noop").mode("overwrite").save()
            except Exception:
                pass
            spark.catalog.clearCache()
            srs, drs = [], []
            guard = oracle_scale_guard(n, sf_dir)
            err = None
            try:
                for _ in range(N_RUNS):
                    t0 = time.perf_counter()
                    reg[n].fn(spark, sf_dir).write.format("noop") \
                        .mode("overwrite").save()
                    srs.append(round(time.perf_counter() - t0, 3))
                    spark.catalog.clearCache()
                    if guard is None and (not drs or min(drs) <= 120):
                        t0 = time.perf_counter()
                        cons.execute(reg[n].oracle).fetchall()
                        drs.append(
                            round(time.perf_counter() - t0, 3))
            except Exception as exc:
                err = f"{type(exc).__name__}: {exc}"[:200]
            rows[n] = {
                "spark_runs": srs, "duck_runs": drs,
                "spark_s": min(srs) if srs else None,
                "duck_s": min(drs) if drs else None,
                "ratio": (round(min(srs) / min(drs), 2)
                          if srs and drs else None),
                **({"oracle_skipped": guard} if guard else {}),
                **({"err": err} if err else {}),
            }
            print(f"# {label} {n}: spark {srs} duck {drs}"
                  + (f" ERR {err}" if err else ""),
                  file=sys.stderr, flush=True)
        cons.close()
        result["sections"][label] = rows
        Path(out_path).write_text(json.dumps(result, indent=1))
    # marginal data cost per entry: what a resident stream pays for
    # 9 more sf0.1-units of data once the machinery is amortized
    marg = {}
    s = result["sections"]
    for n in TARGETS:
        a = s.get("sf0.1", {}).get(n, {}).get("spark_s")
        b = s.get("x10", {}).get(n, {}).get("spark_s")
        if not a or not b:
            continue
        marg[n] = {"sf0.1_wall_s": a, "x10_wall_s": b,
                   "x10_over_sf0.1": round(b / a, 2),
                   "marginal_per_sf0.1_s": round((b - a) / 9, 3)}
    result["marginal"] = marg
    Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    main()

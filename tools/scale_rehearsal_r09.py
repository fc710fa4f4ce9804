"""Round-9 crossover rehearsal (VERDICT r08 #3/#4): measure the five
floor-bound entries at sf0.1 AND x10 on BOTH engines, interleaved
S,D per point, so the artifact shows how the Spark/DuckDB gap closes
as data grows — the honest adjudication for sub-second oracles where
a per-query floor subtraction cannot express a multi-stage plan's
fixed scheduling cost.

x10 corpus: /tmp/scale_r09/x10 (tools/make_scale_tpch.py reusing the
seeded r04 x10 documents/events/embeddings).

Usage: python tools/scale_rehearsal_r09.py [out.json] [names...]
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
    "sims_ann_lsh_bucketed",
    "core_cte_chain_fastsum",
    "curation_quality_classifier",
    "text_tfidf_cosine_pairs",
    "sims_hybrid_rrf",
]
POINTS = [("sf0.1", "/root/testdata/sf0.1"),
          ("x10", "/tmp/scale_r09/x10")]
N = 3
DUCK_CAP_S = 600.0


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = args[0] if args and args[0].endswith(".json") \
        else "/tmp/scale_r09/rehearsal.json"
    names = [a for a in args if not a.endswith(".json")] or TARGETS

    from parity import duck_connection

    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark

    reg = load_all()
    spark = get_spark("energi-scale-r09")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm code paths at the smallest SF
    for n in names:
        try:
            reg[n].fn(spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    result: dict = {"metric": "crossover_rehearsal_r09", "points": {}}
    for label, sf_dir in POINTS:
        cons = duck_connection(sf_dir)
        rows = {}
        for n in names:
            srs, drs = [], []
            errs: list[str] = []
            spark_dead = duck_dead = False
            for _ in range(N):
                if not spark_dead:
                    t0 = time.perf_counter()
                    try:
                        reg[n].fn(spark, sf_dir).write.format("noop") \
                            .mode("overwrite").save()
                        srs.append(round(time.perf_counter() - t0, 3))
                    except Exception as exc:
                        # record once, stop re-running the failing
                        # side — but keep measuring the OTHER engine
                        # so the artifact stays two-sided
                        errs.append(f"spark: {type(exc).__name__}: "
                                    f"{exc}"[:200])
                        spark_dead = True
                    finally:
                        spark.catalog.clearCache()
                if duck_dead or (drs and min(drs) > DUCK_CAP_S):
                    continue
                t0 = time.perf_counter()
                try:
                    cons.execute(reg[n].oracle).fetchall()
                    drs.append(round(time.perf_counter() - t0, 3))
                except Exception as exc:
                    errs.append(f"duck: {type(exc).__name__}: "
                                f"{exc}"[:200])
                    duck_dead = True
            err = "; ".join(errs) or None
            rows[n] = {
                "spark_runs": srs, "duck_runs": drs,
                "spark_s": min(srs) if srs else None,
                "duck_s": min(drs) if drs else None,
                "ratio": (round(min(srs) / min(drs), 2)
                          if srs and drs else None),
                **({"err": err} if err else {}),
            }
            print(f"# {label} {n}: spark={srs} duck={drs}",
                  file=sys.stderr, flush=True)
        cons.close()
        result["points"][label] = rows
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    payload = json.dumps(result, indent=1)
    Path(out_path).write_text(payload + "\n", encoding="utf-8")
    print(payload, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()

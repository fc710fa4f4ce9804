"""Round-12 crossover rehearsal (VERDICT r11 "next round" #1/#5):

x10 (and x100 where affordable) adjudication rows for the two
entries round 12 owes timing evidence:

* ``curation_cluster_representatives`` — the only registry entry
  that reached round 12 with ZERO timing rows (added after SWEEP_r11
  ran); it is also the repo's heaviest composition (LSH pairs -> CC
  closure -> quality gate -> keep-best representative), so the x10
  row is the honest scale statement, not the sf0.1 floor reading.
* ``sims_kmeans_lloyd`` — tripped SWEEP_r11's 2s ABSOLUTE rule
  (3.5s at 1.47x its oracle) from per-iteration localCheckpoint
  scheduling floors; round 12 re-chained the loop (min-struct argmin,
  checkpoint-free at the default 2 iterations) and this row records
  how the remaining floor amortizes at x10 embedding volume.

Each point is an interleaved S,D,S,D min-of-3 pair, same protocol as
SCALE_r10/SCALE_r11.  Scaled corpora: /tmp/scale_r09/{x10,x100}
(tools/make_scale_data.py [+ make_scale_tpch.py]; regenerate if
absent — /tmp is scratch and is wiped between rounds).

Usage: python tools/scale_rehearsal_r12.py [out.json] [section...]
  sections: sf01 x10 x100 (default: sf01 x10 x100)

The output JSON is checkpointed per SECTION (the round-10 rehearsal
lost a 25-minute sweep to a bug in a later section).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

TARGETS = [
    "curation_cluster_representatives",
    "sims_kmeans_lloyd",
]

POINTS = {
    "sf01": "/root/testdata/sf0.1",
    "x10": "/tmp/scale_r09/x10",
    "x100": "/tmp/scale_r09/x100",
}

#: hard per-run oracle cap, enforced by con.interrupt() from a
#: watchdog thread (run_sweep's mechanism — the skip-further-runs
#: rule alone lets the FIRST run grind for hours: the x10
#: cluster-representatives oracle composes the pathological
#: correlated-subquery LSH scoring SQL, 209s at sf0.1 already).
#: A capped oracle is recorded as a timeout; Spark keeps its
#: min-of-3 and the row reads "Spark wins by construction".
DUCK_CAP_S = 120.0
N_RUNS = 3


def _measure_pair(spark, cons, reg, name, sf_dir, n_runs=N_RUNS):
    import threading

    srs, drs, errs = [], [], []
    spark_dead = duck_dead = False
    for _ in range(n_runs):
        if not spark_dead:
            t0 = time.perf_counter()
            try:
                reg[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                srs.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:
                errs.append(f"spark: {type(exc).__name__}: {exc}"[:200])
                spark_dead = True
            finally:
                spark.catalog.clearCache()
        if duck_dead or (drs and min(drs) > DUCK_CAP_S):
            continue
        done = threading.Event()
        # per-run CURSOR (its own DuckDB connection over the same
        # catalog): the old done.wait/is_set recheck only NARROWED
        # the interrupt race — an oracle finishing between the
        # recheck and interrupt() left a stray cancel flag on the
        # shared connection that aborted the next healthy run (r12
        # ADVICE).  A stray interrupt now lands on a cursor that is
        # closed immediately after this run — it cannot leak.
        cur = cons.cursor()

        def _interrupt():
            if not done.wait(DUCK_CAP_S):
                cur.interrupt()

        killer = threading.Thread(target=_interrupt, daemon=True)
        killer.start()
        t0 = time.perf_counter()
        try:
            cur.execute(reg[name].oracle).fetchall()
            drs.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:
            if time.perf_counter() - t0 >= DUCK_CAP_S - 1:
                errs.append(f"duck: timeout >{DUCK_CAP_S}s cap")
            else:
                errs.append(f"duck: {type(exc).__name__}: {exc}"[:200])
            duck_dead = True
        finally:
            done.set()
            killer.join()
            cur.close()
    err = "; ".join(errs) or None
    return {
        "spark_runs": srs, "duck_runs": drs,
        "spark_s": min(srs) if srs else None,
        "duck_s": min(drs) if drs else None,
        "ratio": (round(min(srs) / min(drs), 2) if srs and drs
                  else None),
        **({"err": err} if err else {}),
    }


def main() -> None:
    import os

    from parity import duck_connection

    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    out_path = (args[0] if args and args[0].endswith(".json")
                else "/tmp/scale_r12_sleepers.json")
    sections = [a for a in args if not a.endswith(".json")] \
        or ["sf01", "x10", "x100"]

    spark = get_spark("scale-r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = load_all()
    result: dict = {"loadavg_at_start": list(os.getloadavg()),
                    "targets": TARGETS, "sections": {}}
    for label in sections:
        sf_dir = POINTS.get(label)
        if sf_dir is None or not Path(sf_dir).exists():
            # checkpoint the skip too — an in-memory-only err row
            # vanishes if a later section crashes, defeating the
            # per-section checkpointing this tool exists to provide
            result["sections"][label] = {
                "err": (f"unknown section {label!r}" if sf_dir is None
                        else f"missing {sf_dir}")}
            Path(out_path).write_text(json.dumps(result, indent=1))
            continue
        cons = duck_connection(sf_dir)
        rows = {}
        for n in TARGETS:
            # warm the code path once at a smaller point
            try:
                reg[n].fn(spark, "/root/testdata/sf0.01") \
                    .write.format("noop").mode("overwrite").save()
            except Exception:
                pass
            spark.catalog.clearCache()
            rows[n] = _measure_pair(spark, cons, reg, n, sf_dir)
            print(f"# {label} {n}: spark {rows[n]['spark_runs']} "
                  f"duck {rows[n]['duck_runs']}",
                  file=sys.stderr, flush=True)
        cons.close()
        result["sections"][label] = rows
        Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    main()

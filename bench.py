"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, ...}

Methodology: one shared session (JVM startup excluded, as for any
resident engine); each query executes fully via the noop sink (count
alone would let Catalyst prune the projections we mean to measure).
A DuckDB run of the same oracle SQL is included as
``duckdb_baseline`` so the 2x target (BASELINE.md) is visible in the
same artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "gold_events_full",
    "core_moving_avg_partitioned",
    "core_groupby_agg",
    "core_cte_chain",
    "core_dim_time",
    "core_insert_if_absent",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "sims_cosine_topk_bruteforce",
    "sims_ann_lsh_bucketed",
    "stream_tumbling_window",
    "sessionization_batch",
    "dedup_embedding_cosine",
    "ext_asof_join",
    "ext_range_join_binned",
    "mm_binary_metadata",
]

#: measured executions per query, min reported (symmetric for Spark
#: and DuckDB) — removes scheduler/contention noise, keeps all real
#: per-run work
N_RUNS = 2
#: skip re-runs once a measurement exceeds this: noise is a fixed
#: few-hundred-ms effect, negligible at this duration (and it keeps
#: the whole bench comfortably inside the driver's capture window).
#: 30s, NOT 10s: dedup_ngram_jaccard's first execution pays ~15s of
#: one-time JIT/codegen+page-cache cost against a ~4.5s steady state,
#: and a 10s cutoff skipped exactly the re-run that would have
#: measured it — recording the cold outlier as the query's time.
RERUN_CUTOFF_S = 30.0


def warmup_dir(sf_dir: str) -> str | None:
    """Smallest sibling sf* directory of the benched one (never the
    benched dir itself), or None when no sibling exists — derived,
    not hardcoded, so the warm-up works wherever the data lives."""
    p = Path(sf_dir)
    sibs = sorted(
        (d for d in p.parent.glob("sf*") if d.is_dir() and d != p),
        key=lambda d: float(d.name.replace("sf", "") or "inf"))
    return str(sibs[0]) if sibs else None


def run_spark(sf_dir: str) -> dict[str, float]:
    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark

    spark = get_spark("energi-bench")
    registry = load_all()
    # warm-up: JIT + parquet footer caches, not part of any query time
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Warm every headline code path ONCE at the smallest SIBLING SF
    # (100x less data): JVM JIT + codegen compilation + streaming-
    # engine init (micro-batch planner, state store, memory sink) are
    # one-time costs a resident engine has long paid — measured ~3s
    # of pure first-touch compilation on a 0.5s query.  The warm-up
    # touches none of the measured SF's data, so the timed runs
    # below still pay their full scans/shuffles/aggregations.
    warm = warmup_dir(sf_dir)
    for name in (HEADLINE if warm else []):
        try:
            registry[name].fn(spark, warm) \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # a warm-up miss only costs accuracy, not the run
        spark.catalog.clearCache()

    # min of N_RUNS measured executions per query (symmetric with the
    # DuckDB side): the min is the steady-state time with scheduler /
    # page-cache / CPU-contention noise removed — each run still pays
    # the query's full scans, shuffles and cache materializations
    # (caches are dropped between runs)
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # drop the query's cache()-barrier partitions (cache cost
            # stays inside the measured time; memory does not
            # accumulate across queries or runs)
            spark.catalog.clearCache()
            if best > RERUN_CUTOFF_S:
                break
        times[name] = round(best, 3)
    spark.stop()
    return times


def run_duckdb(sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
    from parity import duck_connection

    from energi_data_pipeline_spark.queries import load_all

    registry = load_all()
    con = duck_connection(sf_dir)
    times: dict[str, float] = {}
    for name in HEADLINE:
        oracle = registry[name].oracle
        if oracle is None:
            continue
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            if best > RERUN_CUTOFF_S:
                break
        times[name] = round(best, 3)
    con.close()
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark_times = run_spark(sf_dir)
    duck_times = run_duckdb(sf_dir)
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(spark_times.values()), 3),
        "unit": "sec",
        "queries": spark_times,
        "sf": sf,
        "duckdb_baseline": duck_times,
        "duckdb_total": round(sum(duck_times.values()), 3),
        "runs_per_query": N_RUNS,
        "aggregation": "min",
        "notes": ("per-query time = min of runs_per_query measured "
                  "executions, Spark and DuckDB alike (steady-state, "
                  "noise removed; caches dropped between runs); "
                  "sessionization is benched via its batch "
                  "window-function twin (sessionization_batch); the "
                  "stateful applyInPandasWithState variant is "
                  "equality-tested in tests/test_streaming_state.py"),
    }
    # The JSON must be the LAST bytes this process emits: Spark's
    # streaming StateStore maintenance thread logs a shutdown stack
    # trace AFTER main() returns, which truncated the round-2 bench
    # artifact (the driver keeps only a bounded output tail).
    # Flush, then hard-exit before any JVM shutdown hook can print.
    print(json.dumps(result), flush=True)
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()

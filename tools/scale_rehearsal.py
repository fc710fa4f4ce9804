"""Scale rehearsal: run the headline operators at sf0.1 and at the
10x synthetic corpus (tools/make_scale_data.py), plus the ANN family
at a 131k-vector corpus (past the planes_for knee), and print one
JSON blob of wall-times.

This turns the 100 TB design arguments (source-blocked near-dup,
day-parallel windows, bucket-keyed ANN with corpus-scaled bucket
count) into measured scaling points: a plan that is linear in the
data should show ~10x work for 10x data (modulo fixed per-query
floor), and the ANN per-probe cost should grow SUBLINEARLY once the
plane count adapts.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
X10 = "/tmp/scale_r04/x10"
ANN131 = "/tmp/scale_r04/ann131k"

#: operator -> scaled table family (for the writeup)
QUERIES_X10 = [
    ("dedup_exact", "documents"),
    ("dedup_minhash_lsh_pairs", "documents"),
    ("dedup_ngram_jaccard", "documents"),
    ("text_quality_score", "documents"),
    ("gold_events_full", "events"),
    ("core_moving_avg_partitioned", "events"),
    ("sessionization_batch", "events"),
    ("sims_ann_lsh_bucketed", "embeddings"),
    ("sims_cosine_topk_bruteforce", "embeddings"),
    ("dedup_embedding_cosine", "embeddings"),
]
QUERIES_ANN = [
    ("sims_ann_lsh_bucketed", "embeddings"),
    ("sims_bucket_balance", "embeddings"),
]
N_RUNS = 2


def main() -> None:
    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.queries.simsearch import (
        corpus_size, planes_for)
    from energi_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-rehearsal")
    registry = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(name: str, sf_dir: str) -> dict:
        fn = registry[name].fn
        runs, rows = [], None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        return {"min_s": min(runs), "runs": runs, "rows": rows}

    out: dict = {"points": {}}
    for name, family in QUERIES_X10:
        rec = {"family": family,
               "sf0.1": timed(name, SF01),
               "x10": timed(name, X10)}
        rec["time_ratio"] = round(
            rec["x10"]["min_s"] / max(rec["sf0.1"]["min_s"], 1e-9), 2)
        out["points"][name] = rec
        print(f"  {name:30s} sf0.1 {rec['sf0.1']['min_s']:7.2f}s  "
              f"x10 {rec['x10']['min_s']:7.2f}s  "
              f"ratio {rec['time_ratio']:5.2f}", flush=True)
    ann = {}
    for name, _family in QUERIES_ANN:
        ann[name] = timed(name, ANN131)
        print(f"  {name:30s} ann131k {ann[name]['min_s']:7.2f}s",
              flush=True)
    out["ann131k"] = ann
    out["ann_index"] = {
        d: {"n_vectors": corpus_size(d),
            "planes": planes_for(corpus_size(d)),
            "buckets": 1 << planes_for(corpus_size(d))}
        for d in (SF01, X10, ANN131)}
    print(json.dumps(out), flush=True)
    Path("/tmp/scale_r04/rehearsal.json").write_text(json.dumps(out))
    import os
    os._exit(0)


if __name__ == "__main__":
    main()

"""Round-5 scale rehearsal (SCALE_r05.md):

1. The two steepest round-4 curves at a THIRD scale point —
   ``dedup_ngram_jaccard`` (9.1x wall at 10x) and
   ``text_tfidf_cosine_pairs`` (2.5x at 10x) at the 30x documents
   corpus — to confirm the wall ratio stays <= the data ratio past
   the measured range.
2. The streaming index-maintenance pair at sf0.1 and 10x — the
   round-4 snapshot-rewrite version measured 4.5x wall at 10x data;
   the append-only rewrite should pull that toward the data ratio.
3. ``dedup_minhash_lsh_pairs`` at 30x (150k docs — past SIG_KNEE,
   so the corpus-adaptive signature widening runs end-to-end).

Run ``python tools/make_scale_data.py`` first (writes /tmp/scale_r04).
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
X30 = "/tmp/scale_r04/x30"

N_RUNS = 2

#: (query, [scale points])
POINTS = [
    ("dedup_ngram_jaccard", [SF01, X10, X30]),
    ("text_tfidf_cosine_pairs", [SF01, X10, X30]),
    ("dedup_minhash_lsh_pairs", [SF01, X10, X30]),
    ("stream_incremental_lsh_dedup", [SF01, X10]),
    ("stream_incremental_embedding_index", [SF01, X10]),
]


def main() -> None:
    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.queries.dedup import (docs_corpus_size,
                                                          minhash_params)
    from energi_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-rehearsal-r05")
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

    out: dict = {"points": {}, "signature": {}}
    for d in (SF01, X10, X30):
        n = docs_corpus_size(d)
        out["signature"][d] = {"n_docs": n,
                               "minhash_params": minhash_params(n)}
    for name, dirs in POINTS:
        rec = {}
        for d in dirs:
            label = {SF01: "sf0.1", X10: "x10", X30: "x30"}[d]
            rec[label] = timed(name, d)
            print(f"  {name:36s} {label:6s} {rec[label]['min_s']:8.2f}s "
                  f"rows={rec[label]['rows']}", flush=True)
        base = rec["sf0.1"]["min_s"]
        for label in rec:
            rec[label]["ratio_vs_sf01"] = round(
                rec[label]["min_s"] / max(base, 1e-9), 2)
        out["points"][name] = rec
    print(json.dumps(out), flush=True)
    Path("/tmp/scale_r04/rehearsal_r05.json").write_text(json.dumps(out))
    import os
    os._exit(0)


if __name__ == "__main__":
    main()

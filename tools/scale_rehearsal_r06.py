"""Round-6 scale rehearsal (SCALE_r06.md addendum):

1. ``dedup_ngram_jaccard`` and ``dedup_containment`` at
   sf0.1/x10/x30 — both switched to the inverted-index COUNT-JOIN
   plan this round, so the SCALE_r05 linearity evidence (measured
   on the PPJoin-prefix plan) must be re-established for the new
   shape.  The scaled corpora grow the source count at constant
   per-source workload, so per-block sum(p^2) is constant and the
   count-join should scale linearly in blocks.
2. ``stream_incremental_lsh_dedup`` at sf0.1/x10 — the
   maxFilesPerTrigger fix makes the 3-batch replay real, superseding
   SCALE_r05's single-batch streaming walls.

Run ``python tools/make_scale_data.py`` first (writes /tmp/scale_r04).
Output: one JSON line + /tmp/scale_r04/rehearsal_r06.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
X10 = "/tmp/scale_r04/x10"
X30 = "/tmp/scale_r04/x30"

N_RUNS = 2

POINTS = [
    ("dedup_ngram_jaccard", [SF01, X10, X30]),
    ("dedup_containment", [SF01, X10, X30]),
    ("stream_incremental_lsh_dedup", [SF01, X10]),
]


def main() -> None:
    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-rehearsal-r06")
    registry = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name, dirs in POINTS:
        fn = registry[name].fn
        out[name] = {}
        for d in dirs:
            runs, rows = [], None
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                df = fn(spark, d)
                rows = df.count()
                runs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            out[name][d] = {"runs": runs, "min": min(runs),
                            "rows": rows}
            print(f"# {name} @ {d}: {runs} rows={rows}",
                  file=sys.stderr, flush=True)
    spark.stop()
    payload = json.dumps({"metric": "scale_rehearsal_r06",
                          "n_runs": N_RUNS, "points": out})
    Path("/tmp/scale_r04/rehearsal_r06.json").write_text(payload + "\n")
    print(payload, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()

"""Round-8 scale rehearsal: dedup_containment past the gram knee.

Fills the SCALE_r06 blank (containment at x100 — the post-knee
sort-merge branch) and measures the r07 verdict #8 experiment: does
widening the gram-join exchange (more, smaller sort runs per core)
cut the single-wave SMJ spill that dominated the x100 wall?

Usage: python tools/scale_rehearsal_r08.py <point> [width] [codec]
  point: x10 | x30 | x100
  width: optional explicit repartition width for the gram join
         (0/absent = the shipped plan)
  codec: optional spark.io.compression.codec override (e.g. zstd) —
         the x100 SMJ spills the whole gram-pair stream, so spill
         bytes ~halve under zstd vs the lz4 default at ~equal CPU
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

POINTS = {"sf0.1": "/root/testdata/sf0.1",
          "x10": "/tmp/scale_r04/x10", "x30": "/tmp/scale_r04/x30",
          "x100": "/tmp/scale_r04/x100"}


def main() -> None:
    point = sys.argv[1]
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    codec = sys.argv[3] if len(sys.argv) > 3 else ""
    sf_dir = POINTS[point]

    from pyspark.sql import functions as F

    import energi_data_pipeline_spark.queries.dedup as D
    import energi_data_pipeline_spark.session as S
    from energi_data_pipeline_spark.session import get_spark

    if codec:
        S.RUNTIME_CONF = {**S.RUNTIME_CONF,
                          "spark.io.compression.codec": codec}
    spark = get_spark(f"scale-r08-{point}")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if width:
        # experiment variant: pin the post-knee gram join's exchange
        # width by repartitioning the BUILD side on its join key —
        # ENSURE_REQUIREMENTS then re-shuffles the probe side to the
        # same width, so both sort runs shrink by width/32
        orig = D.gram_join_side

        def wide(build, sf):
            side = orig(build, sf)
            cols = [c for c in build.columns if c in
                    ("src_b", "h_b", "source", "h")]
            return side.repartition(width, *cols).hint("merge")

        D.gram_join_side = wide

    t0 = time.perf_counter()
    df = D.dedup_containment(spark, sf_dir)
    n_pairs = df.count()
    wall = round(time.perf_counter() - t0, 1)
    out = {"point": point, "width": width or "shipped",
           "codec": codec or "lz4", "containment_wall_s": wall,
           "pairs": n_pairs}
    print(json.dumps(out), flush=True)
    tag = f"{point}_{width or 'ship'}" + (f"_{codec}" if codec else "")
    Path(f"/tmp/scale_r08_{tag}.json").write_text(
        json.dumps(out) + "\n")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


if __name__ == "__main__":
    main()

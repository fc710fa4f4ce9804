"""Round-8 scale rehearsal: dedup_containment past the gram knee.

Fills the SCALE_r06 blank (containment at x100 — the post-knee
sort-merge branch) and measures the r07 verdict #8 experiment: does
widening the gram-join exchange (more, smaller sort runs per core)
cut the single-wave SMJ spill that dominated the x100 wall?

The x100 gram-pair shuffle (~90 GB under zstd) exceeds this box's
~56 GB free scratch, so the x100 point runs through the engine's
bounded-scratch seam (`containment_inter(slice_of=(i, k))`,
slice-exact by construction and by
tests/test_plan_shapes.py::test_containment_slices_exact): k
sequential JVMs each join one disjoint hash-slice of the gram stream
(~1/k spill, cleaned on JVM exit) and write partial per-pair counts
to parquet; a final merge job re-sums and applies the containment
filter.  Total pairs are EXACT, wall is the slice-sum + merge.

Usage:
  python tools/scale_rehearsal_r08.py <point> [width] [codec]
      one unsliced end-to-end run (width: explicit extra repartition
      for the experiment variant, 0/absent = shipped plan; codec:
      spark.io.compression.codec override, e.g. zstd — spill bytes
      ~halve vs the lz4 default at ~equal CPU)
  python tools/scale_rehearsal_r08.py <point> --slice <i> <k> [codec]
      run slice i of k, write partial counts parquet + wall json
  python tools/scale_rehearsal_r08.py <point> --merge <k>
      sum the k partials, filter, count pairs
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
SLICE_DIR = "/tmp/scale_r08_slices"


def build_spark(name, codec):
    import energi_data_pipeline_spark.session as S
    from energi_data_pipeline_spark.session import get_spark

    if codec:
        S.RUNTIME_CONF = {**S.RUNTIME_CONF,
                          "spark.io.compression.codec": codec}
    spark = get_spark(name)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    return spark


def finish(spark, out, tag):
    print(json.dumps(out), flush=True)
    Path(f"/tmp/scale_r08_{tag}.json").write_text(
        json.dumps(out) + "\n")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


def run_slice(point, i, k, codec):
    import energi_data_pipeline_spark.queries.dedup as D

    spark = build_spark(f"scale-r08-{point}-s{i}of{k}", codec)
    t0 = time.perf_counter()
    part = D.containment_inter(spark, POINTS[point], slice_of=(i, k))
    dst = f"{SLICE_DIR}/{point}_k{k}/slice_{i}"
    part.write.mode("overwrite").parquet(dst)
    wall = round(time.perf_counter() - t0, 1)
    finish(spark, {"point": point, "slice": [i, k],
                   "codec": codec or "lz4",
                   "slice_wall_s": wall, "out": dst},
           f"{point}_slice{i}of{k}")


def run_merge(point, k):
    from pyspark.sql import functions as F

    import energi_data_pipeline_spark.queries.dedup as D

    spark = build_spark(f"scale-r08-{point}-merge", "")
    t0 = time.perf_counter()
    parts = spark.read.parquet(f"{SLICE_DIR}/{point}_k{k}/slice_*")
    pairs = D.containment_finish(
        parts.groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.sum("n_common").alias("n_common"))).count()
    wall = round(time.perf_counter() - t0, 1)
    finish(spark, {"point": point, "merge_of": k,
                   "merge_wall_s": wall, "pairs": pairs},
           f"{point}_merge{k}")


def run_whole(point, width, codec):
    import energi_data_pipeline_spark.queries.dedup as D

    spark = build_spark(f"scale-r08-{point}", codec)
    if width:
        # experiment variant: pin the post-knee gram join's exchange
        # width by repartitioning the BUILD side on its join key —
        # ENSURE_REQUIREMENTS then re-shuffles the probe side to the
        # same width, so both sort runs shrink by width/32
        orig = D.gram_join_side

        def wide(build, sf, keys=("src_b", "h_b")):
            side = orig(build, sf, keys)
            cols = [c for c in build.columns if c in
                    ("src_b", "h_b", "source", "h")]
            return side.repartition(width, *cols).hint("merge")

        D.gram_join_side = wide

    t0 = time.perf_counter()
    df = D.dedup_containment(spark, POINTS[point])
    n_pairs = df.count()
    wall = round(time.perf_counter() - t0, 1)
    finish(spark, {"point": point, "width": width or "shipped",
                   "codec": codec or "lz4",
                   "containment_wall_s": wall, "pairs": n_pairs},
           f"{point}_{width or 'ship'}" + (f"_{codec}" if codec
                                           else ""))


def main() -> None:
    point = sys.argv[1]
    rest = sys.argv[2:]
    if rest and rest[0] == "--slice":
        run_slice(point, int(rest[1]), int(rest[2]),
                  rest[3] if len(rest) > 3 else "")
    elif rest and rest[0] == "--merge":
        run_merge(point, int(rest[1]))
    else:
        run_whole(point, int(rest[0]) if rest else 0,
                  rest[1] if len(rest) > 1 else "")


if __name__ == "__main__":
    main()

"""Round-15 scale rehearsal — the r14 verdict's measurement debts.

1. **CC-star x10 row** (verdict #6): `dedup_connected_components_star`
   under the r14 count+anti-join convergence, measured at sf0.1 and
   at the x10 corpus (min of 2, caches dropped), with the ROUNDS
   count from the operator's stats hook — plain CC got its 1.24x row
   in SCALE_r14 §2; this is the deep-graph path's equivalent.
2. **Adaptive-cache-level knee** (r15 change evidence): the _tfidf_w
   weight table and the classifier dense-feature stage now persist
   at io.adaptive_cache_level (serialized MEMORY_AND_DISK under the
   heap-fraction budget, DISK_ONLY past it).  One run of
   `text_tfidf_cosine_pairs` with SPARK_GRAFT_CACHE_BUDGET_BYTES
   pinned BELOW the estimate (forcing the DISK_ONLY path) must
   produce the identical result set as the default-budget run —
   the degrade path is correctness-neutral, only slower.

Writes docs/scale_r15/rehearsal.json (checkpointed per section) and
prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "docs" / "scale_r15"
SF01 = "/root/testdata/sf0.1"
X10 = "/tmp/scale_r09/x10"


def wait_idle() -> dict:
    import bench
    return bench.wait_for_idle()


def checkpoint(doc: dict) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "rehearsal.json").write_text(
        json.dumps(doc, indent=1) + "\n", encoding="utf-8")


def _min2(spark, mk) -> float:
    import bench
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        bench.drop_measurement_caches(spark)
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def section_cc_star_x10(spark, doc: dict) -> None:
    from pyspark.sql import functions as F

    from energi_data_pipeline_spark.operators.graph import (
        connected_components_star)
    from energi_data_pipeline_spark.queries.dedup import (
        dedup_minhash_lsh_pairs)

    import bench

    rows: dict = {}
    for label, sf_dir in (("sf0.1", SF01), ("x10", X10)):
        stats: dict = {}

        def mk():
            pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
            cc = connected_components_star(
                pairs, src="doc_a", dst="doc_b", stats=stats)
            return cc.select(F.col("id").alias("doc_id"),
                             "cluster_id")

        wall = _min2(spark, mk)
        # pairs-leg alone so the row attributes growth between the
        # candidate pair space and the star loop (SCALE_r14 §2
        # showed plain CC's x10 growth lives in the pair pipeline)
        t0 = time.perf_counter()
        dedup_minhash_lsh_pairs(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        pairs_wall = round(time.perf_counter() - t0, 3)
        bench.drop_measurement_caches(spark)
        rows[label] = {"wall_s": wall, "pairs_leg_s": pairs_wall,
                       **stats}
    r = rows.get("x10", {}).get("wall_s", 0.0)
    b = rows.get("sf0.1", {}).get("wall_s", 0.0)
    rows["x10_over_sf01_wall"] = round(r / b, 2) if b else None
    doc["cc_star_x10"] = rows
    checkpoint(doc)


def section_cache_level_knee(spark, doc: dict) -> None:
    from energi_data_pipeline_spark.queries import load_all

    reg = load_all()
    fn = reg["text_tfidf_cosine_pairs"].fn

    def run() -> tuple[float, int, int]:
        import bench
        t0 = time.perf_counter()
        df = fn(spark, SF01)
        rows = df.count()
        wall = round(time.perf_counter() - t0, 3)
        chk = df.selectExpr(
            "sum(hash(doc_a, doc_b, shared_terms, cosine)) AS h"
        ).first()["h"]
        bench.drop_measurement_caches(spark)
        return wall, rows, chk

    default_wall, default_rows, default_chk = run()
    os.environ["SPARK_GRAFT_CACHE_BUDGET_BYTES"] = "1"
    try:
        forced_wall, forced_rows, forced_chk = run()
    finally:
        os.environ.pop("SPARK_GRAFT_CACHE_BUDGET_BYTES", None)
    doc["cache_level_knee"] = {
        "default_budget": {"wall_s": default_wall,
                           "rows": default_rows},
        "budget_1_byte_forces_disk_only": {"wall_s": forced_wall,
                                           "rows": forced_rows},
        "results_identical": bool(default_rows == forced_rows
                                  and default_chk == forced_chk),
        "note": ("budget=1 forces every adaptive persist to "
                 "DISK_ONLY — the over-budget degrade path must be "
                 "correctness-neutral (hash-equal result set), only "
                 "slower"),
    }
    checkpoint(doc)


def main() -> None:
    from energi_data_pipeline_spark.session import get_spark

    doc: dict = {"idle_gate": wait_idle(),
                 "cpus": os.cpu_count(),
                 "sections": ["cc_star_x10", "cache_level_knee"]}
    spark = get_spark("scale-rehearsal-r15")
    # codegen warm-up at the smallest SF so the x10 rows measure
    # data work, not first-touch compilation
    from energi_data_pipeline_spark.queries import load_all
    reg = load_all()
    for name in ("dedup_connected_components_star",
                 "text_tfidf_cosine_pairs"):
        try:
            reg[name].fn(spark, "/root/testdata/sf0.01") \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()
    section_cc_star_x10(spark, doc)
    section_cache_level_knee(spark, doc)
    print(json.dumps({k: doc[k] for k in
                      ("cc_star_x10", "cache_level_knee")}))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


if __name__ == "__main__":
    main()

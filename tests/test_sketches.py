"""Sketch-family invariants.

The driver's oracle compare proves Spark == DuckDB; these tests pin
the MATHEMATICAL guarantees each sketch ships with (the properties a
user relies on at 100 TB, where no exact answer exists to compare
against) and the plan shapes that make them scale.
"""

from __future__ import annotations

from tests.conftest import SF0001, SF001


def test_countmin_never_underestimates(spark):
    # the count-min guarantee: collisions only ADD, so estimate >=
    # exact for every probed item, within d*N/w above it.
    from energi_data_pipeline_spark.queries.sketches import (
        CM_DEPTH, CM_WIDTH, sketch_countmin_heavy_hitters)

    rows = sketch_countmin_heavy_hitters(spark, SF001).collect()
    assert len(rows) == 20
    total = sum(r["exact_cnt"] for r in rows)  # lower bound on N
    for r in rows:
        assert r["overshoot"] >= 0, r
        assert r["cm_estimate"] == r["exact_cnt"] + r["overshoot"]
    # sanity: at least the top item should be estimated tightly
    # relative to the sketch's additive bound shape (not a proof of
    # the eps*N bound, which needs N = full stream mass)
    assert CM_DEPTH >= 1 and CM_WIDTH >= 2 and total > 0


def test_bloom_never_misses_members(spark):
    # a Bloom filter has no false negatives: every true member
    # passes, so candidates >= true members and the exact member
    # count equals the semi-join count.
    from energi_data_pipeline_spark.queries.sketches import (
        sketch_bloom_semijoin)

    r = sketch_bloom_semijoin(spark, SF001).collect()[0]
    assert r["n_candidates"] >= r["n_true"]
    assert r["n_false_pos"] == r["n_candidates"] - r["n_true"]
    assert 0.0 <= r["fp_rate"] < 0.05  # 8192 bits / k=3 is sparse here
    assert r["n_true"] > 0 and r["n_orders"] > r["n_candidates"]


def test_bloom_fact_side_is_map_only(spark):
    # the point of the sketch: the orders (fact) side must reach its
    # verdict without shuffling — broadcast joins only, no exchange
    # above the orders scan except the final 1-row aggregate.
    from energi_data_pipeline_spark.queries.sketches import (
        sketch_bloom_semijoin)

    plan = (sketch_bloom_semijoin(spark, SF0001)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_hll_and_kmv_estimates_are_in_range(spark):
    # distinct sketches have multiplicative error ~1/sqrt(m) resp.
    # ~1/sqrt(k-2); with m=64 / k=32 a 3-sigma band is roughly
    # +/-40%/55%.  A wildly-out-of-band estimate means the register
    # math broke even if it broke identically on both engines (the
    # oracle compare cannot catch a shared-formula bug; this does).
    from energi_data_pipeline_spark.queries.sketches import (
        sketch_hll_distinct, sketch_kmv_distinct)

    for df, col, tol in (
            (sketch_hll_distinct(spark, SF001), "hll_estimate", 0.5),
            (sketch_kmv_distinct(spark, SF001), "kmv_estimate", 0.6)):
        rows = df.collect()
        assert rows
        for r in rows:
            assert r[col] > 0
            assert abs(r["rel_error"]) <= tol, (col, dict(r.asDict()))


def test_kmv_degenerate_small_group_is_exact(spark):
    # a group with fewer than k distinct members must report the
    # exact count (the sketch holds the whole set).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from energi_data_pipeline_spark.queries.sketches import (
        KMV_K, sketch_kmv_distinct)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        n = KMV_K // 2  # below k
        pq.write_table(pa.table({
            "event_id": pa.array(range(n * 3), type=pa.int64()),
            "user_id": pa.array([i % n for i in range(n * 3)],
                                type=pa.int64()),
            "event_type": pa.array(["t"] * (n * 3)),
        }), os.path.join(d, "events.parquet"))
        r = sketch_kmv_distinct(spark, d).collect()[0]
        assert r["n_exact"] == n
        assert r["kmv_estimate"] == float(n)
        assert r["rel_error"] == 0.0


def test_countmin_tolerates_short_docs(spark):
    # regression (round-7 advice): a 0- or 1-token document must
    # yield NO bigrams, not INVALID_INDEX_OF_ZERO — Spark's
    # sequence(1, 0) counts DOWN to [1, 0] while DuckDB's
    # range(1, len) is empty.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from energi_data_pipeline_spark.queries.sketches import (
        sketch_countmin_heavy_hitters)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array(["", "solo",
                              "alpha beta alpha beta",
                              "alpha beta gamma"]),
        }), os.path.join(d, "documents.parquet"))
        rows = sketch_countmin_heavy_hitters(spark, d).collect()
        got = {r["bigram"]: r["exact_cnt"] for r in rows}
        assert got["alpha beta"] == 3
        assert all(r["overshoot"] >= 0 for r in rows)

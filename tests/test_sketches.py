"""Sketch-family invariants.

The driver's oracle compare proves Spark == DuckDB; these tests pin
the MATHEMATICAL guarantees each sketch ships with (the properties a
user relies on at 100 TB, where no exact answer exists to compare
against) and the plan shapes that make them scale.
"""

from __future__ import annotations

import os

import pytest

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


def test_sketch_params_pin_test_scale_and_scale_up():
    # r07 verdict #4: below each knee the param functions return the
    # EXACT test-scale constants (the static oracles depend on it);
    # above it they scale with the input and respect their caps.
    from energi_data_pipeline_spark.queries.sketches import (
        BLOOM_BITS, BLOOM_KNEE_ROWS, BLOOM_MAX_BITS, CM_KNEE_TEXT_BYTES,
        CM_MAX_WIDTH, CM_WIDTH, HLL_ALPHA, HLL_BUCKETS, HLL_KNEE_ROWS,
        HLL_MAX_BUCKETS, bloom_params, cm_params, hll_params)

    # below-knee: bit-identical to the oracle constants
    for n in (1, 100, HLL_KNEE_ROWS):
        assert hll_params(n) == (HLL_BUCKETS, HLL_ALPHA)
    for n in (1, 500, BLOOM_KNEE_ROWS):
        assert bloom_params(n) == BLOOM_BITS
    for b in (1, 150_000, CM_KNEE_TEXT_BYTES):
        assert cm_params(b) == CM_WIDTH

    # the x10 corpus (sf0.1 footprints) crosses all three knees
    m, alpha = hll_params(150_000)
    assert m == 512 and abs(alpha - 0.7213 / (1 + 1.079 / 512)) < 1e-12
    assert bloom_params(15_000) == 262_144  # next_pow2(12 * 15000)
    assert cm_params(1_512_270) == 4096     # next_pow2(252k bigrams / 64)

    # monotone growth + hard caps
    assert hll_params(10**12)[0] == HLL_MAX_BUCKETS
    assert bloom_params(10**12) == BLOOM_MAX_BITS
    assert cm_params(10**15) == CM_MAX_WIDTH


def test_sketch_knees_registered():
    from energi_data_pipeline_spark.queries import (ORACLE_SCALE_KNEES,
                                                    load_all)

    load_all()
    assert ORACLE_SCALE_KNEES["sketch_hll_distinct"][0] == "orders"
    assert ORACLE_SCALE_KNEES["sketch_bloom_semijoin"][0] == "customer"
    tbl, _knee, col = ORACLE_SCALE_KNEES["sketch_countmin_heavy_hitters"]
    assert (tbl, col) == ("documents", "text")  # MASS knee, not rows


def test_sketch_invariants_hold_at_x10(spark):
    # r07 verdict #4 done-bar: at the x10 corpus (sf0.1 — above all
    # three knees, so every sketch runs at its SCALED size) the
    # mathematical guarantees still hold AND the scaled sizes
    # deliver their design error where the fixed test-scale sizes
    # provably could not (an 8192-bit Bloom filter at 2943 build
    # keys admits ~30% of non-members; the scaled 262144-bit one
    # must stay ~1%).
    from tests.conftest import SF01
    if not os.path.isdir(SF01):
        pytest.skip(f"x10 corpus not present at {SF01}")
    from energi_data_pipeline_spark.queries.sketches import (
        sketch_bloom_semijoin, sketch_countmin_heavy_hitters,
        sketch_hll_distinct)

    b = sketch_bloom_semijoin(spark, SF01).collect()[0]
    assert b["n_candidates"] >= b["n_true"]  # no false negatives
    assert b["fp_rate"] < 0.05, b  # scaled filter: design fp holds

    for r in sketch_hll_distinct(spark, SF01).collect():
        # 512 registers -> 1.04/sqrt(512) ~ 4.6% std error; 25% is
        # a >5-sigma envelope that the 64-register sketch at ~25k
        # distinct per group would not reliably meet
        assert abs(r["rel_error"]) < 0.25, r

    rows = sketch_countmin_heavy_hitters(spark, SF01).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overshoot"] >= 0, r
        # scaled width 4096 at ~265k bigram mass: per-row expected
        # collision load ~65; MIN over 3 rows keeps the top-20
        # overshoot far under one expected load of the 512-wide grid
        assert r["overshoot"] <= 3000, r

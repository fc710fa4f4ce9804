"""foreachBatch + merge_upsert: a stream maintaining a LATEST-STATE
table (continuously-updated current values), complementing the
medallion's append-only insert-if-absent path.  Replays are
idempotent because the merge is last-writer-wins on the key.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from energi_data_pipeline_spark.io import merge_upsert, table_path


def _write_batches(tmp_path, batches):
    import os

    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        p = src / f"b{i}.parquet"
        pd.DataFrame(rows, columns=["k", "v"]).astype(
            {"k": "int64", "v": "int64"}).to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return src


def test_stream_foreachbatch_merge_latest_state(spark, tmp_path):
    src = _write_batches(tmp_path, [
        [(1, 10), (2, 20)],
        [(2, 21), (3, 30)],          # 2 updated, 3 inserted
        [(1, 12)],                   # 1 updated
    ])
    wh = str(tmp_path / "wh")

    def upsert_batch(batch_df, _batch_id):
        # within a micro-batch, several versions of a key may arrive;
        # keep the newest deterministically before merging
        latest = (batch_df.sort("k", "v")
                  .groupBy("k").agg({"v": "max"})
                  .withColumnRenamed("max(v)", "v"))
        merge_upsert(batch_df.sparkSession, latest, wh, "gold",
                     "latest_state", keys=["k"])

    q = (spark.readStream.schema("k long, v long")
         .option("maxFilesPerTrigger", "1").parquet(str(src))
         .writeStream.foreachBatch(upsert_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {tuple(r) for r in spark.read.parquet(
        table_path(wh, "gold", "latest_state")).collect()}
    assert got == {(1, 12), (2, 21), (3, 30)}


def test_merge_latest_rows_null_newest_wins(spark):
    """ADVICE r3 (low): a key whose NEWEST event carries NULL must
    surface NULL — whole-row merge, not per-column coalesce (which
    would resurrect the stored non-NULL value)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from energi_data_pipeline_spark.queries.streaming import (
        _merge_latest_rows)

    schema = ("user_id int, event_type string, ts timestamp, "
              "event_id int, value double")
    existing = spark.createDataFrame(
        [(1, "click", datetime(2024, 1, 1, 0, 0), 1, 5.0)], schema)
    batch = spark.createDataFrame(
        [(1, "click", datetime(2024, 1, 1, 0, 5), 2, None),
         (2, "view", datetime(2024, 1, 1, 0, 1), 3, 7.0)], schema)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())

    got = {tuple(r) for r in
           _merge_latest_rows(existing, batch, w).collect()}
    assert got == {
        (1, "click", datetime(2024, 1, 1, 0, 5), 2, None),
        (2, "view", datetime(2024, 1, 1, 0, 1), 3, 7.0)}


def test_incremental_lsh_dedup_matches_batch_any_split(spark, monkeypatch):
    """The incremental-equals-batch invariant must hold for ANY batch
    count, not just the oracle's default 3: replaying the corpus as
    5 ascending-id micro-batches yields the same verdict table as
    the full-batch LSH pair query's lower-id-partner relation.

    5 batches also crosses the SEGMENT_COMPACT_EVERY=4 cycle, so the
    in-stream compaction policy FIRES mid-stream (batch 3 folds
    _bid<=1 of all three index tables) and the invariant proves the
    fold preserved the index contents; and the run executes under
    SPARK_GRAFT_DEBUG_SEGMENT_KEYS=1, so append_batch_segment's
    cross-batch key-disjointness assertion is live for every append
    this stream performs — pinning the caller's ascending-id-span
    contract (r11 verdict #6)."""
    import energi_data_pipeline_spark.queries.streaming as st
    from energi_data_pipeline_spark.queries.dedup import (
        dedup_minhash_lsh_pairs)
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    monkeypatch.setenv("SPARK_GRAFT_DEBUG_SEGMENT_KEYS", "1")
    # NOTE: n_batches is passed explicitly — the old
    # monkeypatch.setattr(st, "INCR_LSH_BATCHES", 4) silently did
    # nothing (the default was bound at def time), so this test was
    # replaying the default 3 batches while claiming 4.
    got = {(r.doc_id, r.is_dup_of_earlier) for r in
           st.stream_incremental_lsh_dedup(spark, sf, n_batches=5)
           .collect()}

    pairs = dedup_minhash_lsh_pairs(spark, sf)
    dup_ids = {r.doc_b for r in pairs.select("doc_b").collect()}
    docs = spark.read.parquet(sf + "/documents.parquet")
    want = {(r.doc_id, r.doc_id in dup_ids)
            for r in docs.select("doc_id").collect()}
    assert got == want


def test_incremental_emb_index_disjoint_keys_contract(spark, monkeypatch):
    """The embedding-index stream (the second append_batch_segment
    caller) runs with the cross-batch key-disjointness assertion
    live — its ascending-vec_id batch spans satisfy the segment
    contract by construction (r11 verdict #6) — and with 5 batches
    the SEGMENT_COMPACT_EVERY=4 compaction policy FIRES mid-stream
    for the bucket-partitioned emb_index (the only array-column
    segment table), so the fold path is actually driven; the verdict
    table must still match the full-corpus relation regardless of
    the split."""
    import energi_data_pipeline_spark.queries.streaming as st

    monkeypatch.setenv("SPARK_GRAFT_DEBUG_SEGMENT_KEYS", "1")
    sf = "/root/testdata/sf0.001"
    got = {(r.vec_id, r.is_dup_of_earlier) for r in
           st.stream_incremental_embedding_index(
               spark, sf, n_batches=5).collect()}
    want = {(r.vec_id, r.is_dup_of_earlier) for r in
            st.stream_incremental_embedding_index(spark, sf)
            .collect()}
    assert got == want and len(got) > 0

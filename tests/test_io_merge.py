"""merge_upsert: MERGE-plan semantics + atomic snapshot publish.

The reference's only conflict primitive is ON CONFLICT DO NOTHING
(first-writer-wins); merge_upsert adds the UPDATE half (SURVEY §7
"What's hard" #3) with a crash-safe publish: staged write + rename
swap, so readers see the old or the new snapshot, never a mix.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from energi_data_pipeline_spark.io import (merge_upsert, merge_upsert_plan,
                                           publish_atomic, table_path)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_plan_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, tag string, v int")
    source = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k int, tag string, v int")
    out = merge_upsert_plan(target, source, ["k"])
    assert _rows(out) == {
        (1, "a", 10),      # unmatched target kept
        (2, "B", 99),      # matched -> source replaces
        (3, "c", 30),
        (4, "d", 40),      # source-only -> inserted
    }


def test_merge_plan_rejects_schema_drift(spark):
    a = spark.createDataFrame([(1, 2)], "k int, v int")
    b = spark.createDataFrame([(1, 2)], "k int, w int")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert_plan(a, b, ["k"])


def test_publish_atomic_swaps_and_cleans(spark, tmp_path):
    path = str(tmp_path / "t")
    publish_atomic(spark.createDataFrame([(1,)], "k int"), path)
    assert _rows(spark.read.parquet(path)) == {(1,)}
    publish_atomic(spark.createDataFrame([(2,)], "k int"), path)
    assert _rows(spark.read.parquet(path)) == {(2,)}
    # no staged/old leftovers
    leftovers = [d for d in os.listdir(tmp_path) if d != "t"]
    assert leftovers == []


def test_publish_atomic_recovers_hard_killed_swap(spark, tmp_path):
    # simulate a SIGKILL between the swap's two renames: the table
    # dir is gone, the previous snapshot is stranded at __old
    from energi_data_pipeline_spark.io import (read_layer_table,
                                               recover_atomic)

    path = str(tmp_path / "gold" / "t")
    publish_atomic(spark.createDataFrame([(1,)], "k int"), path)
    os.rename(path, f"{path}.__old")  # crash window state
    # a reader repairs and sees the OLD snapshot, not a missing table
    df = read_layer_table(spark, str(tmp_path), "gold", "t")
    assert df is not None and _rows(df) == {(1,)}
    assert not os.path.exists(f"{path}.__old")
    assert recover_atomic(path) is False  # idempotent no-op now
    # and a writer starting from the crash state also self-repairs
    os.rename(path, f"{path}.__old")
    publish_atomic(spark.createDataFrame([(2,)], "k int"), path)
    assert _rows(spark.read.parquet(path)) == {(2,)}
    leftovers = [d for d in os.listdir(tmp_path / "gold") if d != "t"]
    assert leftovers == []


def test_merge_upsert_end_to_end(spark, tmp_path):
    wh = str(tmp_path)
    s1 = spark.createDataFrame([(1, 100), (2, 200)], "k int, v int")
    merge_upsert(spark, s1, wh, "gold", "acct", ["k"])
    s2 = spark.createDataFrame([(2, 999), (3, 300)], "k int, v int")
    merge_upsert(spark, s2, wh, "gold", "acct", ["k"])
    got = spark.read.parquet(table_path(wh, "gold", "acct"))
    assert _rows(got) == {(1, 100), (2, 999), (3, 300)}


# ------------------------------------------------- property testing
from hypothesis import HealthCheck, given, settings, strategies as st

rows_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8),
              st.integers(min_value=-100, max_value=100)),
    min_size=0, max_size=12)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(target=rows_st, source=rows_st)
def test_merge_plan_matches_dict_semantics(spark, target, source):
    """merge_upsert_plan == dict.update on last-per-key maps (within
    each input, highest v wins as the deterministic representative)."""
    def dedupe(rows):
        best: dict[int, int] = {}
        for k, v in rows:
            if k not in best or v > best[k]:
                best[k] = v
        return best

    t_map, s_map = dedupe(target), dedupe(source)
    tdf = spark.createDataFrame(
        list(t_map.items()) or [(None, None)], "k int, v int").dropna()
    sdf = spark.createDataFrame(
        list(s_map.items()) or [(None, None)], "k int, v int").dropna()
    out = {(r["k"], r["v"])
           for r in merge_upsert_plan(tdf, sdf, ["k"]).collect()}
    want = dict(t_map)
    want.update(s_map)
    assert out == set(want.items())


# ------------------------------------------------ snapshot versioning
def test_publish_version_time_travel(spark, tmp_path):
    from energi_data_pipeline_spark.io import publish_version, read_version

    path = str(tmp_path / "vt")
    assert publish_version(
        spark.createDataFrame([(1,)], "k int"), path) == 0
    assert publish_version(
        spark.createDataFrame([(2,)], "k int"), path) == 1
    assert _rows(read_version(spark, path)) == {(2,)}          # current
    assert _rows(read_version(spark, path, 0)) == {(1,)}       # travel


def test_publish_version_vacuums_old(spark, tmp_path):
    import pytest as _pytest
    from energi_data_pipeline_spark.io import publish_version, read_version

    path = str(tmp_path / "vt")
    for i in range(5):
        publish_version(
            spark.createDataFrame([(i,)], "k int"), path, keep=2)
    assert _rows(read_version(spark, path)) == {(4,)}
    assert _rows(read_version(spark, path, 3)) == {(3,)}
    with _pytest.raises(FileNotFoundError, match="not retained"):
        read_version(spark, path, 0)


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    from energi_data_pipeline_spark.io import compact_table

    path = str(tmp_path / "t")
    # accrete many tiny files, as per-batch appends do
    spark.range(0, 1000).selectExpr("id", "id * 2 AS v") \
        .repartition(16).write.parquet(path)
    import os
    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before >= 16
    before = {tuple(r) for r in spark.read.parquet(path).collect()}

    n_target = compact_table(spark, path, target_file_bytes=1 << 30)

    assert n_target == 1
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_after == 1
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_compact_table_preserves_partition_layout(spark, tmp_path):
    """ADVICE r3 (medium): compacting a date-partitioned table must
    keep the Hive layout (k=v dirs) — and size itself from the data
    files inside those dirs — or downstream cursor predicates lose
    partition pruning."""
    from energi_data_pipeline_spark.io import compact_table

    path = str(tmp_path / "tp")
    spark.range(0, 300) \
        .selectExpr("id", "CAST(id % 3 AS INT) AS d") \
        .repartition(8).write.partitionBy("d").parquet(path)
    import os
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    part_dirs_before = sorted(
        e for e in os.listdir(path) if e.startswith("d="))
    assert part_dirs_before == ["d=0", "d=1", "d=2"]
    # each partition dir holds several small files
    assert sum(f.endswith(".parquet")
               for f in os.listdir(os.path.join(path, "d=0"))) > 1

    compact_table(spark, path, target_file_bytes=1 << 30)

    part_dirs_after = sorted(
        e for e in os.listdir(path) if e.startswith("d="))
    assert part_dirs_after == ["d=0", "d=1", "d=2"]
    # no stray data files at the table root (layout preserved)
    assert not any(f.endswith(".parquet") for f in os.listdir(path))
    # compacted: one file per partition
    for d in part_dirs_after:
        assert sum(f.endswith(".parquet")
                   for f in os.listdir(os.path.join(path, d))) == 1
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_concurrent_merge_upsert_serializes_writers(spark, tmp_path):
    """Two writers upserting DISJOINT keys concurrently: without the
    writer lock the read-modify-write races and the slower writer's
    snapshot can drop the faster one's rows (lost update).  The
    locked variant must land both."""
    import threading

    from energi_data_pipeline_spark.io import (merge_upsert_concurrent,
                                               read_layer_table)

    wh = str(tmp_path / "wh")
    # seed the table so both writers take the read-merge path
    merge_upsert_concurrent(
        spark, spark.createDataFrame([(0, 0)], "k int, v int"),
        wh, "gold", "acct", keys=["k"])

    errs: list[Exception] = []

    def writer(lo: int) -> None:
        try:
            df = spark.createDataFrame(
                [(k, k * 10) for k in range(lo, lo + 20)], "k int, v int")
            merge_upsert_concurrent(spark, df, wh, "gold", "acct",
                                    keys=["k"], timeout_s=120.0)
        except Exception as ex:  # surfaced below
            errs.append(ex)

    ts = [threading.Thread(target=writer, args=(lo,))
          for lo in (100, 200)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs

    got = {r.k for r in read_layer_table(spark, wh, "gold", "acct")
           .collect()}
    assert got == {0} | set(range(100, 120)) | set(range(200, 220))


def test_table_lock_breaks_stale_and_releases_on_error(tmp_path):
    import os

    from energi_data_pipeline_spark.io import table_lock

    import subprocess

    path = str(tmp_path / "t")
    # stale lock from a DEAD pid is broken, not deadlocked on
    dead = subprocess.Popen(["true"])
    dead.wait()
    with open(path + ".__lock", "w", encoding="utf-8") as fh:
        fh.write(f"{dead.pid} 0.0 deadtoken")
    with table_lock(path, timeout_s=5.0):
        assert os.path.exists(path + ".__lock")
    assert not os.path.exists(path + ".__lock")
    # the lock is released when the guarded block raises
    try:
        with table_lock(path, timeout_s=5.0):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not os.path.exists(path + ".__lock")
    # a LIVE lock times out instead of being stolen — even when its
    # recorded age exceeds stale_s (no stealing from live writers)
    with table_lock(path, timeout_s=5.0):
        import pytest

        with open(path + ".__lock", encoding="utf-8") as fh:
            pid, _ts, tok = fh.read().split()
        with open(path + ".__lock", "w", encoding="utf-8") as fh:
            fh.write(f"{pid} 0.0 {tok}")  # ancient ts, live pid
        with pytest.raises(TimeoutError):
            table_lock(path, timeout_s=0.2, stale_s=0.01).__enter__()
    # release-by-token still worked after the rewrite above
    assert not os.path.exists(path + ".__lock")


def test_table_lock_release_checks_ownership(tmp_path):
    import os

    from energi_data_pipeline_spark.io import table_lock

    path = str(tmp_path / "t2")
    lk = table_lock(path, timeout_s=5.0)
    lk.__enter__()
    # another process "stole" the path (e.g. after a false break):
    # our release must NOT unlink a lock we no longer own
    with open(path + ".__lock", "w", encoding="utf-8") as fh:
        fh.write(f"{os.getpid()} 0.0 someoneelsestoken")
    lk.__exit__(None, None, None)
    assert os.path.exists(path + ".__lock")
    os.unlink(path + ".__lock")


def test_compact_table_preserves_stringy_partition_values(spark, tmp_path):
    """Partition values that LOOK numeric (source='01') must survive
    compaction verbatim: type inference would read them back as int
    1 and re-encode the directory as d=1, silently changing data."""
    import os

    from energi_data_pipeline_spark.io import compact_table

    path = str(tmp_path / "ts")
    spark.createDataFrame(
        [(1, "01"), (2, "01"), (3, "2")], "id int, d string") \
        .repartition(4).write.partitionBy("d").parquet(path)
    assert sorted(e for e in os.listdir(path)
                  if e.startswith("d=")) == ["d=01", "d=2"]
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    spark.conf.set(infer_key, "false")
    try:
        before = {tuple(r) for r in spark.read.parquet(path).collect()}

        compact_table(spark, path, target_file_bytes=1 << 30)

        # the directory VALUES survive verbatim — without the
        # inference guard the rewrite re-encodes d=01 as d=1
        assert sorted(e for e in os.listdir(path)
                      if e.startswith("d=")) == ["d=01", "d=2"]
        after = {tuple(r) for r in spark.read.parquet(path).collect()}
        assert after == before
        assert ("01" in {d for _i, d in after})
    finally:
        spark.conf.set(infer_key, "true")


def test_table_lock_released_when_owner_killed(tmp_path):
    """The flock rewrite's headline property: a lock whose owner dies
    WITHOUT cleanup (kill -9) is released by the kernel — no stale-
    break protocol, no TOCTOU window."""
    import os
    import subprocess
    import sys
    import textwrap
    import time

    from energi_data_pipeline_spark.io import table_lock

    repo_root = str(Path(__file__).resolve().parents[1])
    path = str(tmp_path / "t3")
    child = subprocess.Popen(
        [sys.executable, "-c", textwrap.dedent(f"""
            import sys, time
            sys.path.insert(0, {repo_root!r})
            from energi_data_pipeline_spark.io import table_lock
            lk = table_lock({path!r}, timeout_s=30.0)
            lk.__enter__()
            print("HELD", flush=True)
            time.sleep(60)
        """)],
        stdout=subprocess.PIPE, text=True)
    assert child.stdout.readline().strip() == "HELD"
    # lock is genuinely held: a short acquire attempt times out
    import pytest

    with pytest.raises(TimeoutError):
        table_lock(path, timeout_s=0.3).__enter__()
    # kill -9 the owner; the kernel drops its flock with the fds
    child.kill()
    child.wait()
    t0 = time.time()
    with table_lock(path, timeout_s=10.0):
        pass  # acquired despite the owner never releasing
    assert time.time() - t0 < 5.0


# ----------------- append_batch_segment: idempotent-by-construction
# micro-batch appends (round-11: replaces the per-batch anti-join in
# the streaming index pipelines; replay of batch N overwrites its own
# _bid partition instead of reading the accumulated table)


def test_segment_append_accumulates_batches(spark, tmp_path):
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               read_layer_table)
    wh = str(tmp_path)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b1 = spark.createDataFrame([(3, "c")], "k int, v string")
    append_batch_segment(spark, b0, wh, "silver", "t", 0)
    append_batch_segment(spark, b1, wh, "silver", "t", 1)
    out = read_layer_table(spark, wh, "silver", "t")
    # the internal _bid partition column never reaches readers
    assert set(out.columns) == {"k", "v"}
    assert _rows(out) == {(1, "a"), (2, "b"), (3, "c")}


def test_segment_append_replay_overwrites_own_segment(spark, tmp_path):
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               read_layer_table)
    wh = str(tmp_path)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b1 = spark.createDataFrame([(3, "c")], "k int, v string")
    append_batch_segment(spark, b0, wh, "silver", "t", 0)
    append_batch_segment(spark, b1, wh, "silver", "t", 1)
    # replay batch 0 (at-least-once redelivery): its segment is
    # overwritten in place — no duplicate rows, batch 1 untouched
    append_batch_segment(spark, b0, wh, "silver", "t", 0)
    out = read_layer_table(spark, wh, "silver", "t")
    assert out.count() == 3
    assert _rows(out) == {(1, "a"), (2, "b"), (3, "c")}


def test_segment_append_replay_repairs_partial_segment(spark, tmp_path):
    """A crash mid-segment leaves partial files; the replay's dynamic
    overwrite must repair them (this is why the manifest
    skip-if-present variant was rejected — it would preserve the
    corruption forever)."""
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               read_layer_table, table_path)
    wh = str(tmp_path)
    full = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    append_batch_segment(spark, full, wh, "silver", "t", 0)
    # simulate the crash: drop all but one data file from the segment
    seg = Path(table_path(wh, "silver", "t")) / "_bid=0"
    parts = sorted(seg.glob("*.parquet"))
    if len(parts) > 1:
        for p in parts[1:]:
            p.unlink()
        assert read_layer_table(spark, wh, "silver", "t").count() < 3
    append_batch_segment(spark, full, wh, "silver", "t", 0)  # replay
    assert _rows(read_layer_table(spark, wh, "silver", "t")) == {
        (1, "a"), (2, "b"), (3, "c")}


def test_segment_append_with_partition_columns(spark, tmp_path):
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               read_layer_table)
    from pyspark.sql import functions as F
    wh = str(tmp_path)
    b0 = spark.createDataFrame(
        [(1, 0, "x"), (2, 1, "y")], "k int, band int, key string")
    append_batch_segment(spark, b0, wh, "silver", "t", 0,
                         partition_by=["band"])
    append_batch_segment(spark, b0, wh, "silver", "t", 0,  # replay
                         partition_by=["band"])
    out = read_layer_table(spark, wh, "silver", "t")
    assert out.count() == 2
    # band survives as a partition-directory column (string-typed
    # when partitionColumnTypeInference is off — cast on read-back,
    # same contract the index streams follow)
    assert {int(r[0]) for r in out.select(
        F.col("band").cast("int")).collect()} == {0, 1}


def test_segment_compaction_folds_and_preserves(spark, tmp_path):
    """compact_batch_segments folds every segment at or below the
    replay horizon into the _bid=-1 base, bounds the directory count,
    preserves rows exactly, and keeps LIVE segments replayable."""
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               compact_batch_segments,
                                               read_layer_table,
                                               table_path)
    wh = str(tmp_path)
    for b in range(5):
        df = spark.createDataFrame(
            [(b * 10 + i, f"v{b}_{i}") for i in range(3)],
            "k int, v string")
        append_batch_segment(spark, df, wh, "silver", "t", b)
    before = _rows(read_layer_table(spark, wh, "silver", "t"))
    assert len(before) == 15

    folded = compact_batch_segments(spark, wh, "silver", "t",
                                    upto_bid=2)
    assert folded == 3
    seg_dirs = sorted(
        d for d in Path(table_path(wh, "silver", "t")).iterdir()
        if d.name.startswith("_bid="))
    assert [d.name for d in seg_dirs] == ["_bid=-1", "_bid=3", "_bid=4"]
    assert _rows(read_layer_table(spark, wh, "silver", "t")) == before

    # a LIVE (uncompacted) batch replays idempotently as before
    df3 = spark.createDataFrame(
        [(30 + i, f"v3_{i}") for i in range(3)], "k int, v string")
    append_batch_segment(spark, df3, wh, "silver", "t", 3)
    assert _rows(read_layer_table(spark, wh, "silver", "t")) == before

    # compacting again with no eligible segments is a no-op
    assert compact_batch_segments(spark, wh, "silver", "t",
                                  upto_bid=2) == 0

    # a second horizon advance folds the rest into the same base
    assert compact_batch_segments(spark, wh, "silver", "t",
                                  upto_bid=10) == 2
    assert _rows(read_layer_table(spark, wh, "silver", "t")) == before
    seg_dirs = sorted(
        d for d in Path(table_path(wh, "silver", "t")).iterdir()
        if d.name.startswith("_bid="))
    assert [d.name for d in seg_dirs] == ["_bid=-1"]


def test_segment_compaction_with_partition_columns(spark, tmp_path):
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               compact_batch_segments,
                                               read_layer_table)
    from pyspark.sql import functions as F
    wh = str(tmp_path)
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i % 2, f"x{b}{i}") for i in range(4)],
            "k int, band int, key string")
        append_batch_segment(spark, df, wh, "silver", "t", b,
                             partition_by=["band"])
    before = {
        (r["k"], int(r["band"]), r["key"]) for r in
        read_layer_table(spark, wh, "silver", "t")
        .select("k", F.col("band").cast("int").alias("band"), "key")
        .collect()}
    assert compact_batch_segments(spark, wh, "silver", "t",
                                  upto_bid=1,
                                  partition_by=["band"]) == 2
    after = {
        (r["k"], int(r["band"]), r["key"]) for r in
        read_layer_table(spark, wh, "silver", "t")
        .select("k", F.col("band").cast("int").alias("band"), "key")
        .collect()}
    assert after == before


def test_segment_compaction_derives_and_guards_partition_layout(
        spark, tmp_path):
    """Omitting partition_by derives the on-disk layout (compacting a
    band-partitioned table must NOT flatten band into a data column —
    mixed partition depths make the whole table unreadable); passing
    a WRONG partition_by is refused loudly."""
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               compact_batch_segments,
                                               read_layer_table,
                                               table_path)
    from pyspark.sql import functions as F
    wh = str(tmp_path)
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i % 2, f"x{b}{i}") for i in range(4)],
            "k int, band int, key string")
        append_batch_segment(spark, df, wh, "silver", "t", b,
                             partition_by=["band"])
    # derive: no partition_by passed, layout preserved
    assert compact_batch_segments(spark, wh, "silver", "t",
                                  upto_bid=1) == 2
    base = Path(table_path(wh, "silver", "t")) / "_bid=-1"
    assert sorted(d.name for d in base.iterdir()
                  if d.name.startswith("band=")) == ["band=0", "band=1"]
    out = read_layer_table(spark, wh, "silver", "t")
    assert out.count() == 12
    assert {int(r[0]) for r in
            out.select(F.col("band").cast("int")).collect()} == {0, 1}
    # refuse: a mismatching partition_by is an error, not corruption
    with pytest.raises(ValueError, match="on-disk segment layout"):
        compact_batch_segments(spark, wh, "silver", "t", upto_bid=2,
                               partition_by=["key"])


# ---------------- round-12 hardening (VERDICT r11 #6 + ADVICE items)


def test_segment_append_keys_assertion_catches_overlap(spark, tmp_path):
    """The opt-in keys= debug assertion: disjoint batches pass, a
    batch whose keys already live in an EARLIER segment raises, and a
    REPLAY of a batch's own keys (same _bid) stays legal — replay
    overwrites its own segment, that is the whole design."""
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               read_layer_table)
    wh = str(tmp_path)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b1 = spark.createDataFrame([(3, "c"), (4, "d")], "k int, v string")
    append_batch_segment(spark, b0, wh, "silver", "t", 0, keys=["k"])
    append_batch_segment(spark, b1, wh, "silver", "t", 1, keys=["k"])
    # replay of batch 1 with identical keys: legal (own segment)
    append_batch_segment(spark, b1, wh, "silver", "t", 1, keys=["k"])
    assert read_layer_table(spark, wh, "silver", "t").count() == 4
    # a NEW batch re-using key 2 violates the cross-batch contract
    bad = spark.createDataFrame([(2, "dup")], "k int, v string")
    with pytest.raises(ValueError, match="key-disjoint"):
        append_batch_segment(spark, bad, wh, "silver", "t", 2,
                             keys=["k"])
    # ... and without keys= the (documented) contract is the
    # caller's problem — no check, no error
    append_batch_segment(spark, bad, wh, "silver", "t", 2)


def test_segment_append_repairs_hard_killed_compaction(spark, tmp_path):
    """ADVICE (medium): a compaction swap hard-killed between its two
    renames strands the full snapshot at <path>.__old with the table
    dir gone.  The NEXT APPEND must repair it before writing —
    otherwise the recreated dir makes recover_atomic a no-op forever
    and the compacted history is silently dropped for append-only
    tables that are never read between appends."""
    import shutil
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               read_layer_table,
                                               table_path)
    wh = str(tmp_path)
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, f"v{b}{i}") for i in range(2)],
            "k int, v string")
        append_batch_segment(spark, df, wh, "silver", "t", b)
    path = table_path(wh, "silver", "t")
    before = _rows(read_layer_table(spark, wh, "silver", "t"))
    # simulate the hard kill between publish_atomic's two renames
    shutil.move(path, f"{path}.__old")
    assert not os.path.exists(path)
    b3 = spark.createDataFrame([(30, "v30")], "k int, v string")
    append_batch_segment(spark, b3, wh, "silver", "t", 3)
    after = _rows(read_layer_table(spark, wh, "silver", "t"))
    assert after == before | {(30, "v30")}  # history survived
    assert not os.path.exists(f"{path}.__old")


def test_segment_partition_cols_skips_empty_and_rejects_mixed(
        spark, tmp_path):
    """ADVICE (low): the layout derivation scans ALL segments — an
    empty first segment dir (stranded partial write) must not
    misreport the layout as unpartitioned, and genuinely mixed
    layouts raise instead of silently republishing under the wrong
    one."""
    from energi_data_pipeline_spark.io import (_segment_partition_cols,
                                               append_batch_segment,
                                               compact_batch_segments,
                                               table_path)
    wh = str(tmp_path)
    df = spark.createDataFrame(
        [(i, i % 2, f"x{i}") for i in range(4)],
        "k int, band int, key string")
    append_batch_segment(spark, df, wh, "silver", "t", 1,
                         partition_by=["band"])
    path = table_path(wh, "silver", "t")
    # stranded EMPTY segment dir sorting FIRST (_bid=0 < _bid=1)
    os.makedirs(os.path.join(path, "_bid=0"))
    assert _segment_partition_cols(path) == ["band"]
    # stranded empty PARTITION subdir as the first sibling inside a
    # live segment: layout is derived from where data files actually
    # live, so the empty band=-1 dir carries no vote (the first-child
    # chain walk would have marked the whole segment empty)
    os.makedirs(os.path.join(path, "_bid=1", "band=-1"))
    assert _segment_partition_cols(path) == ["band"]
    # compaction derives the right layout despite the empty dir
    # (folded count includes the stranded empty dir it sweeps away)
    assert compact_batch_segments(spark, wh, "silver", "t",
                                  upto_bid=1) == 2
    # genuinely mixed layouts are refused loudly
    wh2 = os.path.join(str(tmp_path), "mixed")
    append_batch_segment(spark, df, wh2, "silver", "t", 0,
                         partition_by=["band"])
    append_batch_segment(spark, df, wh2, "silver", "t", 1)  # flat
    with pytest.raises(ValueError, match="disagree"):
        _segment_partition_cols(table_path(wh2, "silver", "t"))


def test_maybe_compact_segments_policy(spark, tmp_path):
    """The wired policy (VERDICT r11 #4): N batches through
    maybe_compact_segments leave at most every+horizon _bid segments
    plus the -1 base, with identical read-back, and every-batch
    compaction (the quadratic shape) is refused."""
    from energi_data_pipeline_spark.io import (append_batch_segment,
                                               maybe_compact_segments,
                                               read_layer_table,
                                               table_path)
    wh = str(tmp_path)
    every, horizon = 3, 1
    expect = set()
    for b in range(9):
        df = spark.createDataFrame(
            [(b * 10 + i, f"v{b}{i}") for i in range(2)],
            "k int, v string")
        expect |= {(b * 10 + i, f"v{b}{i}") for i in range(2)}
        append_batch_segment(spark, df, wh, "silver", "t", b)
        maybe_compact_segments(spark, wh, "silver", "t", b,
                               every=every, horizon=horizon)
        segs = [d for d in os.listdir(table_path(wh, "silver", "t"))
                if d.startswith("_bid=") and d != "_bid=-1"]
        assert len(segs) <= every + horizon
        assert _rows(read_layer_table(spark, wh, "silver", "t")) \
            == expect
    # fired on batches 2, 5, 8: base exists, only recent segs live
    segs = sorted(d for d in os.listdir(table_path(wh, "silver", "t"))
                  if d.startswith("_bid="))
    assert segs == ["_bid=-1", "_bid=7", "_bid=8"]
    with pytest.raises(ValueError, match="every must be"):
        maybe_compact_segments(spark, wh, "silver", "t", 9, every=1)

"""Commit-log table format: transactional multi-writer semantics
WITHOUT rename atomicity (simulated object store).

Every test runs under ``deny_rename`` — ``os.rename``/``os.replace``
/``shutil.move`` raise inside the table-protocol code paths — so a
regression that sneaks a rename into the commit protocol fails
loudly.  (Spark's own JVM-side segment committer is out of scope by
design: a half-written segment is unreferenced until its commit
object exists, see module docstring.)
"""

from __future__ import annotations

import os
import shutil

import pytest

from energi_data_pipeline_spark.commitlog import (CommitLogTable,
                                                  ConcurrentWriteError,
                                                  LocalObjectStore)


@pytest.fixture
def deny_rename(monkeypatch):
    def _deny(*_a, **_k):
        raise AssertionError(
            "rename/move used inside the commit-log protocol — "
            "object stores have no rename")

    monkeypatch.setattr(os, "rename", _deny)
    monkeypatch.setattr(os, "replace", _deny)
    monkeypatch.setattr(shutil, "move", _deny)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def make(spark, data, cols=("k", "v")):
    return spark.createDataFrame(data, list(cols))


def test_put_if_absent_is_exclusive(tmp_path, deny_rename):
    st = LocalObjectStore()
    p = str(tmp_path / "obj")
    assert st.put_if_absent(p, b"a") is True
    assert st.put_if_absent(p, b"b") is False
    assert st.read(p) == b"a"


def test_overwrite_and_read(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"))
    assert t.read(spark) is None
    v = t.overwrite(spark, make(spark, [(1, "a"), (2, "b")]))
    assert v == 0
    assert rows(t.read(spark)) == [(1, "a"), (2, "b")]


def test_append_accumulates_segments(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"))
    t.append(spark, make(spark, [(1, "a")]))
    v = t.append(spark, make(spark, [(2, "b")]))
    assert v == 1
    assert rows(t.read(spark)) == [(1, "a"), (2, "b")]
    assert len(t.manifest()["segments"]) == 2


def test_time_travel(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"))
    t.overwrite(spark, make(spark, [(1, "a")]))
    t.overwrite(spark, make(spark, [(1, "z"), (2, "b")]))
    assert rows(t.read(spark, version=0)) == [(1, "a")]
    assert rows(t.read(spark, version=1)) == [(1, "z"), (2, "b")]


def test_insert_if_absent_first_writer_wins(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"))
    t.insert_if_absent(spark, make(spark, [(1, "a"), (2, "b")]), ["k"])
    t.insert_if_absent(spark, make(spark, [(2, "LOSER"), (3, "c")]), ["k"])
    assert rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


def test_insert_if_absent_replay_commits_nothing(spark, tmp_path,
                                                 deny_rename):
    """Idempotent re-runs must not bump the version or accumulate
    empty segments (ADVICE r08: transact only short-circuited on
    None, so an all-duplicate batch committed an empty segment)."""
    t = CommitLogTable(str(tmp_path / "t"))
    t.insert_if_absent(spark, make(spark, [(1, "a"), (2, "b")]), ["k"])
    v0 = t.current_version()
    segs0 = t.manifest(v0)["segments"]
    # exact replay: nothing new -> no new commit, no new segment
    t.insert_if_absent(spark, make(spark, [(1, "a"), (2, "b")]), ["k"])
    assert t.current_version() == v0
    assert t.manifest(t.current_version())["segments"] == segs0
    # a genuinely-new row still commits
    t.insert_if_absent(spark, make(spark, [(2, "dup"), (3, "c")]), ["k"])
    assert t.current_version() == v0 + 1
    assert rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_upserts(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"))
    t.merge(spark, make(spark, [(1, "a"), (2, "b")]), ["k"])
    t.merge(spark, make(spark, [(2, "B2"), (3, "c")]), ["k"])
    assert rows(t.read(spark)) == [(1, "a"), (2, "B2"), (3, "c")]


def test_concurrent_merge_no_lost_update(spark, tmp_path, deny_rename):
    """The lost-update scenario flock exists for on POSIX, solved
    lock-free: writer A resolves its snapshot, writer B commits
    UNDERNEATH it, A's first commit attempt must lose put-if-absent
    and recompute against B's table.  Both writers' rows survive."""
    t = CommitLogTable(str(tmp_path / "t"))
    t.overwrite(spark, make(spark, [(1, "base1"), (2, "base2")]))

    attempts = {"n": 0}

    def build_a(base):
        attempts["n"] += 1
        if attempts["n"] == 1:
            # contending writer B lands a full merge between A's
            # snapshot resolution and A's commit attempt
            t.merge(spark, make(spark, [(2, "from_B"), (4, "B_new")]),
                    ["k"])
        from energi_data_pipeline_spark.io import merge_upsert_plan

        src = make(spark, [(1, "from_A"), (3, "A_new")])
        return src if base is None else merge_upsert_plan(base, src, ["k"])

    v = t.transact(spark, build_a, op="overwrite")
    assert attempts["n"] == 2  # A lost once, recomputed, won
    assert v == 2
    assert rows(t.read(spark)) == [
        (1, "from_A"), (2, "from_B"), (3, "A_new"), (4, "B_new")]


def test_concurrent_insert_if_absent_race(spark, tmp_path, deny_rename):
    """First-writer-wins must hold when the 'first' writer commits
    between the second's snapshot and commit: the second's anti-join
    re-runs against the fresh head and drops the conflicting key."""
    t = CommitLogTable(str(tmp_path / "t"))
    fired = {"done": False}
    orig_put = t.store.put_if_absent

    def racing_put(path, data):
        if not fired["done"]:
            fired["done"] = True
            # writer B sneaks in the same key first
            t2 = CommitLogTable(t.path)
            t2.insert_if_absent(
                spark, make(spark, [(1, "B_first")]), ["k"])
        return orig_put(path, data)

    t.store.put_if_absent = racing_put
    t.insert_if_absent(spark, make(spark, [(1, "A_late"), (2, "a2")]),
                       ["k"])
    assert rows(t.read(spark)) == [(1, "B_first"), (2, "a2")]


def test_transact_gives_up_after_retries(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"))
    t.store.put_if_absent = lambda *_a, **_k: False  # always lose
    with pytest.raises(ConcurrentWriteError):
        t.transact(spark, lambda base: make(spark, [(1, "x")]),
                   max_retries=3)


def test_vacuum_reclaims_orphans_keeps_live(spark, tmp_path, deny_rename):
    t = CommitLogTable(str(tmp_path / "t"), keep=2)
    t.overwrite(spark, make(spark, [(1, "a")]))          # v0
    t.overwrite(spark, make(spark, [(1, "b")]))          # v1
    t.overwrite(spark, make(spark, [(1, "c")]))          # v2
    # plant an orphan (losing writer's segment, never referenced)
    orphan = os.path.join(t.path, "data", "deadbeef")
    make(spark, [(9, "orphan")]).write.parquet(orphan)
    removed = t.vacuum(grace_s=0.0)
    # v0's segment + the orphan go; v1/v2 (keep=2) stay readable
    assert "deadbeef" in removed
    assert rows(t.read(spark)) == [(1, "c")]
    assert rows(t.read(spark, version=1)) == [(1, "b")]
    with pytest.raises(Exception):
        t.read(spark, version=0)


def test_crashed_writer_invisible(spark, tmp_path, deny_rename):
    """A writer that dies after writing its segment but before its
    commit object leaves the table bit-identical for readers."""
    t = CommitLogTable(str(tmp_path / "t"))
    t.overwrite(spark, make(spark, [(1, "a")]))
    before = rows(t.read(spark))
    # simulate the crash: segment written, commit never created
    t._write_segment(make(spark, [(666, "ghost")]))
    assert rows(t.read(spark)) == before
    assert t.current_version() == 0


def test_first_append_of_empty_batch_creates_nothing(spark, tmp_path,
                                                     deny_rename):
    """The no-empty-segments contract holds from version 0: the
    first-ever insert_if_absent of an empty batch publishes no
    commit and leaves no segment (round-10 review: the footer probe
    originally skipped the base_v-is-None path, so a fresh table's
    v0 could reference an empty segment)."""
    t = CommitLogTable(str(tmp_path / "t"))
    empty = make(spark, [(1, "a")]).filter("k < 0")
    assert t.insert_if_absent(spark, empty, ["k"]) == -1
    assert t.current_version() is None
    # the discarded segment is gone, not left as orphan garbage
    data_dir = os.path.join(str(tmp_path / "t"), "data")
    assert not os.path.isdir(data_dir) or not os.listdir(data_dir)
    # and the table still initializes normally afterwards
    t.insert_if_absent(spark, make(spark, [(1, "a")]), ["k"])
    assert t.current_version() == 0
    assert rows(t.read(spark)) == [(1, "a")]

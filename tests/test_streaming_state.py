"""Sessionization state-carry across micro-batches.

The oracle parity test drains everything in ONE batch, which never
executes the carried-open-session splice.  Here the events table is
split into two time-ordered files and the stream runs with
``maxFilesPerTrigger=1`` under Trigger.AvailableNow — two
micro-batches, so sessions spanning the file boundary must be
continued from the state store (numbering offset + start/count
splice).  The latest emission per session must equal a plain
batch-computed sessionization of the full data.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from energi_data_pipeline_spark.queries.streaming import (
    SESSION_GAP_MIN, run_sessionize_stream)

SF = "/root/testdata/sf0.001"


def expected_sessions(pdf: pd.DataFrame) -> set:
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    out = set()
    for user, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().reset_index(drop=True)
        new_sess = ts.diff().isna() | (ts.diff() > gap)
        sess_no = new_sess.cumsum()
        for sno, s in ts.groupby(sess_no):
            out.add((int(user), int(sno), s.min(), s.max(), len(s)))
    return out


def test_state_carries_across_micro_batches(spark, tmp_path):
    table = pq.read_table(os.path.join(SF, "events.parquet"))
    pdf = table.to_pandas().sort_values("ts").reset_index(drop=True)
    half = len(pdf) // 2
    src = tmp_path / "src"
    src.mkdir()
    # two time-ordered files; mtimes force batch order = time order
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        p = src / f"ev{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    result = run_sessionize_stream(
        spark, str(src), glob="ev*.parquet", max_files_per_trigger=1,
        checkpoint=str(tmp_path / "ckpt"))
    # "update" memory sink appends every emission; the final state of
    # a session is its latest (largest) emission
    final = (result.groupBy("user_id", "session_no")
             .agg({"session_start": "min", "session_end": "max",
                   "n_events": "max"})
             .collect())
    got = {(r["user_id"], r["session_no"], r["min(session_start)"],
            r["max(session_end)"], r["max(n_events)"]) for r in final}

    # events ts is int64 nanos in the parquet; truncate to micros the
    # same way the engine does
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ns").dt.floor("us")
    want = expected_sessions(pdf[["user_id", "ts"]])
    assert got == want
    # sanity: the boundary actually split sessions across batches
    assert len(want) > 150  # more sessions than users -> real gaps

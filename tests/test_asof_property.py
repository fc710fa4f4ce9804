"""Property test: operators.asof.asof_join ≡ pandas.merge_asof
(backward, allow_exact_matches) on random inputs.

The oracle-parity test pins the operator against DuckDB's ASOF JOIN
on one dataset; this pins the SEMANTICS on adversarial shapes —
exact-time ties, left rows before any right row, duplicate left
times, keys present on only one side.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from energi_data_pipeline_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TIMES = st.integers(min_value=0, max_value=50)

left_rows = st.lists(st.tuples(KEYS, TIMES), min_size=1, max_size=15)
right_rows = st.lists(
    st.tuples(KEYS, TIMES, st.integers(min_value=0, max_value=999)),
    min_size=1, max_size=15,
    unique_by=lambda r: (r[0], r[1]))  # unique (key, time): tie-free


def expected_merge_asof(lrows, rrows):
    left = pd.DataFrame(lrows, columns=["k", "t"]) \
        .sort_values(["t", "k"], kind="stable")
    right = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values("t")
    out = pd.merge_asof(left, right, on="t", by="k",
                        direction="backward", allow_exact_matches=True)
    return sorted((int(r.k), int(r.t), None if pd.isna(r.v) else int(r.v))
                  for r in out.itertuples())


def run_asof(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(int(k), int(t)) for k, t in lrows], "k int, t int")
    right = spark.createDataFrame(
        [(int(k), int(t), int(v)) for k, t, v in rrows],
        "k int, rt int, v int")
    out = asof_join(left, right, on=["k"], left_time="t",
                    right_time="rt", values=["v"])
    return sorted((r["k"], r["t"], r["v"]) for r in out.collect())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    assert run_asof(spark, lrows, rrows) \
        == expected_merge_asof(lrows, rrows)


@pytest.mark.parametrize("lrows,rrows", [
    # exact-time tie: inclusive match
    ([(0, 10)], [(0, 10, 1)]),
    # left before any right: NULL
    ([(0, 5)], [(0, 10, 1)]),
    # duplicate left times share the same match
    ([(0, 10), (0, 10), (0, 12)], [(0, 9, 7), (0, 11, 8)]),
    # key only on the left: NULL
    ([(1, 10)], [(0, 5, 1)]),
])
def test_asof_edges(spark, lrows, rrows):
    assert run_asof(spark, lrows, rrows) \
        == expected_merge_asof(lrows, rrows)


# --------------------------------------------------- forward as-of
def expected_merge_asof_fwd(lrows, rrows):
    left = pd.DataFrame(lrows, columns=["k", "t"]) \
        .sort_values(["t", "k"], kind="stable")
    right = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values("t")
    out = pd.merge_asof(left, right, on="t", by="k",
                        direction="forward", allow_exact_matches=True)
    return sorted((int(r.k), int(r.t), None if pd.isna(r.v) else int(r.v))
                  for r in out.itertuples())


def run_asof_fwd(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(int(k), int(t)) for k, t in lrows], "k int, t int")
    right = spark.createDataFrame(
        [(int(k), int(t), int(v)) for k, t, v in rrows],
        "k int, rt int, v int")
    out = asof_join(left, right, on=["k"], left_time="t",
                    right_time="rt", values=["v"], direction="forward")
    return sorted((r["k"], r["t"], r["v"]) for r in out.collect())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_forward_matches_pandas(spark, lrows, rrows):
    assert run_asof_fwd(spark, lrows, rrows) \
        == expected_merge_asof_fwd(lrows, rrows)


@pytest.mark.parametrize("lrows,rrows", [
    ([(0, 10)], [(0, 10, 1)]),            # exact-time tie: inclusive
    ([(0, 15)], [(0, 10, 1)]),            # left after all rights: NULL
    ([(0, 10), (0, 8)], [(0, 9, 7), (0, 11, 8)]),
    ([(1, 10)], [(0, 5, 1)]),             # key only on the left: NULL
])
def test_asof_forward_edges(spark, lrows, rrows):
    assert run_asof_fwd(spark, lrows, rrows) \
        == expected_merge_asof_fwd(lrows, rrows)

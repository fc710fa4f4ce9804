"""Property test: the bucket-parallel trailing window equals the
plain window on random inputs.

operators.windows.with_trailing_partitioned claims EXACT equality
with the single-partition window for any bucketing; fuzz it over
random data where hypothesis controls bucket boundaries, duplicate
order keys, short/empty buckets, and frames larger than a bucket.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window, functions as F

from energi_data_pipeline_spark.operators.windows import (
    with_trailing_partitioned)

rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=60),   # t (order key)
              st.integers(min_value=0, max_value=2),    # g (group)
              st.integers(min_value=0, max_value=99)),  # v (value)
    min_size=1, max_size=30,
    unique_by=lambda r: (r[0], r[1]))  # unique (t, g): frame-determinism
K = 4
BUCKET_W = 10  # bucket = t // 10 -> frames of 4 often span buckets


def build(spark, data):
    return spark.createDataFrame(
        [(int(t), int(g), float(v)) for t, g, v in data],
        "t int, g int, v double")


def aggs(w):
    return [F.round(F.avg("v").over(w), 6).alias("avg_v"),
            F.round(F.sum("v").over(w), 6).alias("sum_v")]


def collect(df):
    return sorted((r["t"], r["g"], r["avg_v"], r["sum_v"])
                  for r in df.collect())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=rows)
def test_bucketed_equals_global(spark, data):
    # t repeats across groups, so the global ordering needs the
    # (t, g) tie-break — an order that doesn't uniquely sort rows
    # makes BOTH windows nondeterministic
    df = build(spark, data)
    got = with_trailing_partitioned(
        df, ["t", "g"], K, aggs,
        bucket=(F.col("t") / BUCKET_W).cast("int"))
    want = df.select(
        "*", *aggs(Window.orderBy("t", "g").rowsBetween(-(K - 1), 0)))
    assert collect(got.select("t", "g", "avg_v", "sum_v")) \
        == collect(want.select("t", "g", "avg_v", "sum_v"))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=rows)
def test_grouped_bucketed_equals_grouped(spark, data):
    df = build(spark, data)
    got = with_trailing_partitioned(
        df, "t", K, aggs, bucket=(F.col("t") / BUCKET_W).cast("int"),
        group_by=["g"])
    want = df.select(
        "*", *aggs(Window.partitionBy("g").orderBy("t")
                   .rowsBetween(-(K - 1), 0)))
    assert collect(got.select("t", "g", "avg_v", "sum_v")) \
        == collect(want.select("t", "g", "avg_v", "sum_v"))

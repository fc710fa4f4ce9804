"""Trailing row-frame window aggregation, single-node and scaled.

The reference's gold layer is 18 window aggregates over
``ORDER BY time_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW`` with
**no PARTITION BY** (gold_aggr.py:104-177).  An unpartitioned window
collapses to one task in Spark — fine at parity-test scale, fatal at
100 TB.  This module provides both:

* :func:`trailing_exprs` — the plain global-window expressions used
  where oracle-exact ordering matters (driver correctness gate).
* :func:`with_trailing_partitioned` — the scale path: partition the
  window by a bucket (e.g. ``to_date(ts)``), then repair the first
  ``k`` rows of every bucket by replaying the previous buckets' last
  ``k`` rows ("warm-up" rows, the same lookback-and-trim trick the
  reference itself uses at its incremental boundary,
  gold_aggr.py:98,219).  The warm-up set is ~``k`` rows per bucket —
  tiny — so it is broadcast; the result is exact equality with the
  global window while every bucket computes in parallel.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, functions as F

WARMUP_FLAG = "__is_warmup"


def trailing_window(order_cols: list[str], k: int,
                    partition_by: list[str] | None = None):
    """``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` window spec."""
    w = Window.orderBy(*order_cols)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    return w.rowsBetween(-(k - 1), 0)


def with_trailing_partitioned(
    df: DataFrame,
    order_col: str | list[str],
    k: int,
    agg_builder: Callable[[object], list[Column]],
    bucket: Column | None = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Exact global trailing-k-row window, computed bucket-parallel.

    ``agg_builder(windowspec) -> [aliased Column, ...]`` supplies the
    aggregate expressions.  ``bucket`` defaults to
    ``to_date(order_col)`` (day partitioning, the natural grain for
    a 1-row-per-minute fact table; ~1440 rows per bucket at the
    reference's feed rate, adjustable for denser streams).

    Exactness argument: a trailing k-row frame for a row in bucket B
    can only reach rows in B or the previous buckets' last k-1 rows.
    We replay, for every bucket, the k-1 globally-latest rows older
    than that bucket's first row, mark them as warm-up, run the
    window partitioned by bucket, and drop warm-up rows.  Gaps and
    short buckets are handled because warm-up rows are taken from
    *all* earlier rows, not just the adjacent bucket.
    """
    # extra order columns only break ties (duplicate timestamps) so a
    # row's frame is deterministic; bucketing stays on the first col.
    # ``group_by`` generalizes to PARTITION BY <group> windows: every
    # group is bucketed independently and warm-up donors only flow
    # within their group — (group, bucket) is the unit of parallelism
    # instead of one task per group.
    order_cols = [order_col] if isinstance(order_col, str) else order_col
    desc_order = [F.col(c).desc() for c in order_cols]
    group_by = group_by or []
    if bucket is None:
        bucket = F.to_date(F.col(order_cols[0]))
    b = df.withColumn("__bucket", bucket)
    part = group_by + ["__bucket"]

    # Last k-1 rows of every (group, bucket) — candidate warm-up
    # donors.  k-1 rows each => tiny (groups * days * (k-1)) =>
    # broadcast.
    per_bucket = Window.partitionBy(*part).orderBy(*desc_order)
    tails = (
        b.withColumn("__rn", F.row_number().over(per_bucket))
        .filter(F.col("__rn") < k)
        .drop("__rn")
    )

    # For each target (group, bucket), the donors are tail rows of
    # the SAME group from strictly earlier buckets; keep the k-1
    # latest per target.
    buckets = b.select(*part).distinct()
    join_cond = F.col("__src_bucket") < F.col("__bucket")
    for g in group_by:
        join_cond = join_cond & (F.col(f"__src_{g}") == F.col(g))
    donors_src = tails.withColumnRenamed("__bucket", "__src_bucket")
    for g in group_by:
        donors_src = donors_src.withColumnRenamed(g, f"__src_{g}")
    donors = (
        F.broadcast(donors_src)
        .join(buckets, join_cond, "inner")
        .drop(*[f"__src_{g}" for g in group_by])
    )
    pick = Window.partitionBy(*part).orderBy(*desc_order)
    warmup = (
        donors.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") < k)
        .drop("__rn", "__src_bucket")
        .withColumn(WARMUP_FLAG, F.lit(True))
    )

    unioned = b.withColumn(WARMUP_FLAG, F.lit(False)).unionByName(warmup)
    w = (
        Window.partitionBy(*part)
        .orderBy(*order_cols)
        .rowsBetween(-(k - 1), 0)
    )
    out = unioned.select("*", *agg_builder(w))
    return out.filter(~F.col(WARMUP_FLAG)).drop(WARMUP_FLAG, "__bucket")

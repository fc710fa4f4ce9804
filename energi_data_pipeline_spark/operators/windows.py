"""Trailing row-frame window aggregation, single-node and scaled.

The reference's gold layer is 18 window aggregates over
``ORDER BY time_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW`` with
**no PARTITION BY** (gold_aggr.py:104-177).  An unpartitioned window
collapses to one task in Spark — fine at parity-test scale, fatal at
100 TB.  This module provides both:

* :func:`trailing_exprs` — the plain global-window expressions used
  where oracle-exact ordering matters (driver correctness gate).
* :func:`with_trailing_partitioned` — the scale path: partition the
  window by a bucket (e.g. ``to_date(ts)``), compute everything in
  ONE bucket-parallel window pass, then repair the first ``k-1``
  rows of every bucket (whose frames reach earlier buckets — the
  same lookback-and-trim boundary the reference itself handles at
  its incremental edge, gold_aggr.py:98,219) from the tiny
  bucket-edge set.  Exact equality with the global window, every
  bucket computes in parallel, and the corpus is scanned and
  shuffled exactly once (see the in-function design note).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, functions as F


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
    #
    # SINGLE-SHUFFLE design (round-6; the round-1..5 version shuffled
    # the corpus three times — a donor-tails window pass, a distinct-
    # buckets aggregation, and the final window — with no exchange
    # reuse, 4.3x the oracle on gold_events_full).  Now:
    #
    # 1. ONE corpus window pass partitioned by (group, bucket)
    #    computes row_number, a last-k-1-rows flag, AND the trailing
    #    aggregates.  Interior rows (rn >= k) have their whole frame
    #    inside the bucket — already exact.
    # 2. EDGE rows — the first k-1 (frames reach earlier buckets:
    #    values wrong, need repair) and last k-1 (the donor rows
    #    those frames reach) of every bucket — are ~2(k-1) rows per
    #    (group, bucket): tiny at any scale.  Re-running the window
    #    over just this set, partitioned by group alone, yields
    #    exact values for the first-k-1 rows: walking a head row's
    #    frame backwards never leaves the set (in-bucket
    #    predecessors are heads; at most k-1 rows are drawn from
    #    earlier buckets, always their latest rows, i.e. tails).
    # 3. Result = interior ∪ repaired heads (disjoint, complete).
    #
    # Both filter branches sit directly above the SAME window-over-
    # exchange subtree, so Spark's ReuseExchange materializes the
    # shuffle once; the corpus is scanned once and shuffled once at
    # every scale, and no corpus-sized cache is required.
    order_cols = [order_col] if isinstance(order_col, str) else order_col
    group_by = group_by or []
    if bucket is None:
        bucket = F.to_date(F.col(order_cols[0]))
    b = df.withColumn("__bucket", bucket)
    part = group_by + ["__bucket"]

    w = (Window.partitionBy(*part).orderBy(*order_cols)
         .rowsBetween(-(k - 1), 0))
    wn = Window.partitionBy(*part).orderBy(*order_cols)
    # __tail: row is among its bucket's last k-1 (lead falls off the
    # partition end) — same window spec as row_number, so rn, tail
    # flag and the aggregates all evaluate in ONE Window exec pass
    main = b.select(
        "*",
        F.row_number().over(wn).alias("__rn"),
        F.lead(F.lit(1), k - 1).over(wn).isNull().alias("__tail"),
        *agg_builder(w),
    )
    agg_names = main.columns[len(b.columns) + 2:]
    helper = ["__rn", "__tail", "__bucket"]

    interior = main.filter(F.col("__rn") >= k).drop(*helper)
    edge = main.filter((F.col("__rn") < k) | F.col("__tail"))
    wg = ((Window.partitionBy(*group_by) if group_by else Window)
          .orderBy(*order_cols).rowsBetween(-(k - 1), 0))
    repaired = (
        edge.drop(*agg_names)
        .select("*", *agg_builder(wg))
        .filter(F.col("__rn") < k)
        .drop(*helper)
    )
    return interior.unionByName(repaired)

"""As-of (point-in-time) join — a core time-series operator Spark
has no native form of (DuckDB/kdb/pandas `merge_asof` do).

For each left row, pick the single right row with the greatest
``right_time <= left_time`` within the join-key group (backward
as-of).  The scalable composition — instead of a range-condition
join whose fan-out explodes — is the union + last-ignoring-nulls
window:

1. tag left rows 1, right rows 0; union them (right carries only
   key, time, and value columns — left's columns ride as NULL and
   vice versa);
2. one shuffle: window partitioned by key, ordered by
   (time, tag) — a right row at exactly the left timestamp sorts
   first, making the match inclusive;
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding
   frame propagates the latest right values forward;
4. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows on the key — same as an equi-join
— with no pair blow-up, so it holds at 100 TB.  Right rows must be
unique per (key, time) for a deterministic result; callers
pre-aggregate ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TIME, _TAG = "__asof_t", "__asof_is_left"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_time: str, right_time: str,
              values: list[str],
              direction: str = "backward") -> DataFrame:
    """As-of join; see module docstring.

    ``on``: equi-key columns (same names both sides);
    ``values``: right columns to bring onto each left row (NULL when
    no right row qualifies);
    ``direction``: ``"backward"`` (latest right at-or-before the left
    time — the default and DuckDB/pandas default) or ``"forward"``
    (earliest right at-or-after).  Forward mirrors the same one-
    shuffle composition: right rows sort AFTER left rows at equal
    times (so the match stays inclusive) and ``first(ignorenulls)``
    over the unbounded-FOLLOWING frame propagates the next right
    values backward.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    clash = set(values) & set(left.columns)
    if clash:
        # left rows would carry non-null values that last(ignorenulls)
        # propagates as if they were right-side matches — silently
        # corrupt results, so reject instead
        raise ValueError(
            f"asof_join: values columns {sorted(clash)} already exist "
            "on the left side; rename them before joining")
    right_tag = 0 if direction == "backward" else 2
    l2 = (left
          .withColumn(_TIME, F.col(left_time))
          .withColumn(_TAG, F.lit(1)))
    r2 = (right
          .select(*on, F.col(right_time).alias(_TIME),
                  *[F.col(v) for v in values])
          .withColumn(_TAG, F.lit(right_tag)))
    u = l2.unionByName(r2, allowMissingColumns=True)
    if direction == "backward":
        w = (Window.partitionBy(*on).orderBy(_TIME, _TAG)
             .rowsBetween(Window.unboundedPreceding, 0))
        fill = lambda v: F.last(v, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (Window.partitionBy(*on).orderBy(_TIME, _TAG)
             .rowsBetween(0, Window.unboundedFollowing))
        fill = lambda v: F.first(v, ignorenulls=True).over(w)  # noqa: E731
    for v in values:
        u = u.withColumn(v, fill(v))
    return u.filter(F.col(_TAG) == 1).drop(_TIME, _TAG)

"""Flagship gold-layer query on the ``events`` time series.

Transposes the reference's full gold build (gold_aggr.py:66-221) to
the driver's events table: CTE chain = (dim features join) ->
derived measures with CASE guards -> 5-row trailing window aggs +
volatility -> row-level guarded ratio -> ordered output.  The window
is partitioned by event_type (the 100 TB-safe shape, SURVEY §4.3);
the global-window parity variant is ``core_moving_avg_5row``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.guards import guarded_ratio
from ..functions.timeparts import dow_sunday0, is_weekend, season
from . import query
from .core import t

GOLD_EVENTS_SQL = """
WITH time_series AS (
    SELECT ts AS time_id,
           event_type,
           value AS amount,
           CASE WHEN value >= 100 THEN value ELSE 0 END AS large_component,
           CASE WHEN value < 100 THEN value ELSE 0 END AS small_component,
           CASE WHEN value > 0
                THEN (CASE WHEN value >= 100 THEN value ELSE 0 END) / value
                ELSE 0 END AS large_ratio,
           CAST(EXTRACT(DOW FROM ts) AS INTEGER) AS day_of_week,
           CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hour_of_day,
           EXTRACT(DOW FROM ts) IN (0, 6) AS is_weekend,
           CAST(CASE WHEN EXTRACT(MONTH FROM ts) IN (12, 1, 2) THEN 0
                     WHEN EXTRACT(MONTH FROM ts) IN (3, 4, 5) THEN 1
                     WHEN EXTRACT(MONTH FROM ts) IN (6, 7, 8) THEN 2
                     ELSE 3 END AS INTEGER) AS season
    FROM events),
aggregated AS (
    SELECT time_id, event_type,
           ROUND(AVG(amount) OVER w, 6) AS avg_amount,
           ROUND(AVG(large_component) OVER w, 6) AS avg_large_component,
           ROUND(AVG(large_ratio) OVER w, 6) AS avg_large_ratio,
           ROUND(STDDEV(amount) OVER w, 6) AS amount_volatility,
           CASE WHEN small_component > 0
                THEN large_component / small_component
                ELSE 1 END AS large_small_ratio,
           day_of_week, hour_of_day, is_weekend, season
    FROM time_series
    WINDOW w AS (PARTITION BY event_type ORDER BY time_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
SELECT * FROM aggregated
"""


@query("gold_events_full", GOLD_EVENTS_SQL)
def gold_events_full(spark, sf_dir):
    """Full gold build on events: join-free dim features + guarded
    derived measures + 18-style trailing window aggregates
    (gold_aggr.py:66-221 transposed)."""
    ev = t(spark, sf_dir, "events")
    ts, v = F.col("ts"), F.col("value")
    large = F.when(v >= 100, v).otherwise(F.lit(0.0))
    small = F.when(v < 100, v).otherwise(F.lit(0.0))
    series = ev.select(
        ts.alias("time_id"),
        "event_type",
        v.alias("amount"),
        large.alias("large_component"),
        small.alias("small_component"),
        guarded_ratio(large, v, 0.0).alias("large_ratio"),
        dow_sunday0(ts).alias("day_of_week"),
        F.hour(ts).cast("int").alias("hour_of_day"),
        is_weekend(ts).alias("is_weekend"),
        season(ts).alias("season"),
    )
    # PARTITION BY event_type alone caps the window at one task per
    # type (5 tasks at any scale — the round-1 scale-killer); the
    # grouped bucket-parallel operator computes the identical frames
    # at (event_type, day) grain via warm-up-row replay.  Safe here:
    # (event_type, ts) is unique, so ORDER BY time_id is a total
    # order within each group.
    from ..operators.windows import with_trailing_partitioned

    def aggs(w):
        return [
            F.round(F.avg("amount").over(w), 6).alias("avg_amount"),
            F.round(F.avg("large_component").over(w), 6)
            .alias("avg_large_component"),
            F.round(F.avg("large_ratio").over(w), 6)
            .alias("avg_large_ratio"),
            F.round(F.stddev("amount").over(w), 6)
            .alias("amount_volatility"),
        ]

    out = with_trailing_partitioned(
        series, "time_id", 5, aggs, group_by=["event_type"])
    return out.select(
        "time_id", "event_type",
        "avg_amount", "avg_large_component", "avg_large_ratio",
        "amount_volatility",
        guarded_ratio(F.col("large_component"), F.col("small_component"), 1.0)
        .alias("large_small_ratio"),
        "day_of_week", "hour_of_day", "is_weekend", "season",
    )

"""As-of join query: events enriched with each user's most recent
order (operators.asof).  The oracle is DuckDB's native ASOF LEFT
JOIN, so the composition is verified against a first-class engine
implementation of the same semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join
from . import query
from .core import t

ASOF_SQL = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate,
         MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.ts, e.user_id,
       o.o_orderkey AS asof_orderkey,
       o.o_orderdate AS asof_orderdate
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


@query("ext_asof_join", ASOF_SQL)
def ext_asof_join(spark, sf_dir):
    """For every event, the latest order of the same user placed at
    or before the event timestamp (backward as-of, inclusive).
    Orders are pre-deduplicated to one row per (user, date) with the
    max orderkey so ties resolve deterministically on both engines."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = t(spark, sf_dir, "orders")
    o = (orders.groupBy(F.col("o_custkey").alias("user_id"),
                        "o_orderdate")
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    joined = asof_join(
        ev, o, on=["user_id"], left_time="ts", right_time="o_orderdate",
        values=["o_orderkey", "o_orderdate"])
    return joined.select(
        "event_id", "ts", "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"))


ASOF_FWD_SQL = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate,
         MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.ts, e.user_id,
       o.o_orderkey AS next_orderkey,
       o.o_orderdate AS next_orderdate
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts <= o.o_orderdate
"""


@query("ext_asof_join_forward", ASOF_FWD_SQL)
def ext_asof_join_forward(spark, sf_dir):
    """Forward as-of: for every event, the EARLIEST order of the same
    user at or after the event ("time to next purchase" analyses).
    Same one-shuffle union+window composition as the backward join,
    mirrored (first-ignoring-nulls over the unbounded-following
    frame); the oracle is DuckDB's native ASOF with the inequality
    flipped."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = t(spark, sf_dir, "orders")
    o = (orders.groupBy(F.col("o_custkey").alias("user_id"),
                        "o_orderdate")
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    joined = asof_join(
        ev, o, on=["user_id"], left_time="ts", right_time="o_orderdate",
        values=["o_orderkey", "o_orderdate"], direction="forward")
    return joined.select(
        "event_id", "ts", "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"))


#: lookback tolerance (days): an as-of match older than this is
#: discarded (pandas merge_asof's ``tolerance`` semantics).
ASOF_TOL_DAYS = 7

ASOF_TOL_SQL = f"""
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate,
         MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate),
j AS (
  SELECT e.event_id, e.ts, e.user_id,
         o.o_orderkey, o.o_orderdate
  FROM events e ASOF LEFT JOIN o
    ON e.user_id = o.user_id AND e.ts >= o.o_orderdate)
SELECT event_id, ts, user_id,
       CASE WHEN CAST(ts AS DATE) <= CAST(o_orderdate AS DATE) + {ASOF_TOL_DAYS}
            THEN o_orderkey END AS asof_orderkey,
       CASE WHEN CAST(ts AS DATE) <= CAST(o_orderdate AS DATE) + {ASOF_TOL_DAYS}
            THEN o_orderdate END AS asof_orderdate,
       (o_orderdate IS NOT NULL
        AND CAST(ts AS DATE) > CAST(o_orderdate AS DATE) + {ASOF_TOL_DAYS})
         AS expired
FROM j
"""


@query("ext_asof_join_tolerance", ASOF_TOL_SQL)
def ext_asof_join_tolerance(spark, sf_dir):
    """Backward as-of with a TOLERANCE window (pandas merge_asof's
    ``tolerance``): the latest same-user order still counts only if
    it is at most {ASOF_TOL_DAYS} days before the event; staler
    matches null out (and are flagged ``expired``).  Correct by the
    as-of property itself: the join already picks the LATEST
    eligible order, so if that one is out of tolerance, every other
    candidate is too — tolerance is a pure post-projection, no
    second join.  Same one-shuffle union+window plan as the plain
    as-of; the date-granularity comparison is expressed identically
    on both engines."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = t(spark, sf_dir, "orders")
    o = (orders.groupBy(F.col("o_custkey").alias("user_id"),
                        "o_orderdate")
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    joined = asof_join(
        ev, o, on=["user_id"], left_time="ts", right_time="o_orderdate",
        values=["o_orderkey", "o_orderdate"])
    fresh = (F.col("ts").cast("date")
             <= F.date_add("o_orderdate", ASOF_TOL_DAYS))
    return joined.select(
        "event_id", "ts", "user_id",
        F.when(fresh, F.col("o_orderkey")).alias("asof_orderkey"),
        F.when(fresh, F.col("o_orderdate")).alias("asof_orderdate"),
        (F.col("o_orderdate").isNotNull() & ~fresh).alias("expired"))

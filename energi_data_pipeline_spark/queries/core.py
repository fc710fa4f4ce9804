"""Core relational parity queries (SURVEY.md §2 rows 8-24).

The ``events`` table is the time-series analog of the reference's
``power_system_raw`` (ts ↔ minutes1_utc, value ↔ measure); TPC-H-ish
tables exercise the general relational operators at realistic join
shapes.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession, Window, functions as F

from ..io import read_table
from ..session import tune
from ..functions.timeparts import dow_sunday0, is_weekend, season
from . import query

#: mid-range cursor for the events table (2024-01-01 .. 2024-01-30)
WM = datetime(2024, 1, 15, 0, 0, 0)
WM_SQL = "TIMESTAMP '2024-01-15 00:00:00'"
EPOCH = datetime(1970, 1, 1)


def t(spark: SparkSession, sf_dir: str, name: str):
    tune(spark)
    return read_table(spark, sf_dir, name)


def dsum(col, alias):
    """Exact SUM via DECIMAL(38,10) accumulation, surfaced as a
    rounded DOUBLE.

    Accumulation stays exact/order-independent in DECIMAL, but the
    *output* is ``ROUND(CAST(sum AS DOUBLE), 6)`` on both engines:
    raw DECIMAL at the compare boundary hash-failed at the driver in
    round 1 (representation drift the local harness could not even
    reproduce — VERDICT.md "What's wrong" #1).  ROUND after the cast
    is order-independent and absorbs DuckDB's 1-ulp DECIMAL->DOUBLE
    cast error for unscaled values beyond 2^53."""
    return F.round(
        F.sum(col.cast("decimal(38,10)")).cast("double"), 6).alias(alias)


#: exact decimal sum for use INSIDE larger expressions (no rounding)
DSUM_RAW_SQL = "SUM(CAST({expr} AS DECIMAL(38,10)))"
#: DuckDB's direct DECIMAL->DOUBLE cast is not correctly rounded once
#: the unscaled value exceeds 2^53 (measured: 3758439620.06 ->
#: ...0600004); routing through VARCHAR uses the correctly-rounded
#: string parse, which matches Spark's BigDecimal.doubleValue exactly.
DDOUBLE_SQL = "CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"
#: boundary-safe form: what :func:`dsum` emits
DSUM_SQL = ("ROUND(" + DDOUBLE_SQL.format(
    expr="SUM(CAST({expr} AS DECIMAL(38,10)))") + ", 6)")


# ---------------------------------------------------------------- row 8
@query(
    "core_watermark_max",
    f"""SELECT COALESCE(MAX(ts), TIMESTAMP '1970-01-01 00:00:00') AS wm,
               COUNT(*) AS n_rows
        FROM events""",
)
def core_watermark_max(spark, sf_dir):
    """Self-watermark cursor: COALESCE(MAX(ts), epoch)
    (silver_transform.py:54-58, gold_aggr.py:59-63)."""
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.coalesce(F.max("ts"), F.lit(EPOCH)).alias("wm"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ----------------------------------------------------------- rows 9-10
@query(
    "core_filter_range_notnull",
    f"""SELECT event_id, ts, event_type, value
        FROM events
        WHERE ts > {WM_SQL} AND value IS NOT NULL""",
)
def core_filter_range_notnull(spark, sf_dir):
    """Cursor range predicate + NOT NULL guard
    (silver_transform.py:80,103-104)."""
    ev = t(spark, sf_dir, "events")
    return ev.filter((F.col("ts") > F.lit(WM)) & F.col("value").isNotNull()) \
             .select("event_id", "ts", "event_type", "value")


# --------------------------------------------------------------- row 11
@query(
    "core_project_rename_arith",
    """SELECT l_orderkey,
              l_linenumber AS line_no,
              l_extendedprice * (1 - l_discount) AS net_price,
              l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
              l_quantity * l_extendedprice AS qty_price
       FROM lineitem""",
)
def core_project_rename_arith(spark, sf_dir):
    """Projection + rename + column arithmetic
    (silver_transform.py:85-106, e.g. exchange_dk1_de + exchange_dk2_de)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("net_price"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         * (1 + F.col("l_tax"))).alias("charged"),
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("qty_price"),
    )


# ----------------------------------------------------------- rows 12-14
DIM_TIME_SQL = """SELECT DISTINCT
           ts AS time_id,
           CAST(ts AS DATE) AS date_day,
           CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hour,
           CAST(EXTRACT(MINUTE FROM ts) AS INTEGER) AS minute,
           CAST(EXTRACT(DOW FROM ts) AS INTEGER) AS day_of_week,
           EXTRACT(DOW FROM ts) IN (0, 6) AS is_weekend,
           CAST(CASE WHEN EXTRACT(MONTH FROM ts) IN (12, 1, 2) THEN 0
                     WHEN EXTRACT(MONTH FROM ts) IN (3, 4, 5) THEN 1
                     WHEN EXTRACT(MONTH FROM ts) IN (6, 7, 8) THEN 2
                     ELSE 3 END AS INTEGER) AS season
       FROM events"""


@query("core_dim_time", DIM_TIME_SQL)
def core_dim_time(spark, sf_dir):
    """dim_time build: DISTINCT + date-part extraction + CASE buckets
    (silver_transform.py:61-82); DuckDB DOW semantics (SURVEY §4.2.3)."""
    ev = t(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        ts.alias("time_id"),
        F.to_date(ts).alias("date_day"),
        F.hour(ts).cast("int").alias("hour"),
        F.minute(ts).cast("int").alias("minute"),
        dow_sunday0(ts).alias("day_of_week"),
        is_weekend(ts).alias("is_weekend"),
        season(ts).alias("season"),
    ).distinct()


# --------------------------------------------------------------- row 15
@query(
    "core_insert_if_absent",
    f"""WITH dst AS (
          SELECT DISTINCT event_id // 50 AS batch_key
          FROM events WHERE ts <= {WM_SQL}),
        batch AS (
          SELECT event_id // 50 AS batch_key, event_id, user_id, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY event_id // 50
                                    ORDER BY event_id) AS rn
          FROM events WHERE ts > {WM_SQL})
        SELECT batch_key, event_id, user_id, ts, value
        FROM batch b
        WHERE rn = 1
          AND NOT EXISTS (SELECT 1 FROM dst d
                          WHERE d.batch_key = b.batch_key)""",
)
def core_insert_if_absent(spark, sf_dir):
    """INSERT .. ON CONFLICT DO NOTHING as a left-anti join
    (silver_transform.py:81,105): in-batch first-writer-wins dedup
    (deterministic: lowest event_id per key), then drop keys already
    present in the destination.  The boundary batch_key straddling
    the watermark is the conflicting row that gets silently dropped."""
    ev = t(spark, sf_dir, "events")
    key = (F.col("event_id") / 50).cast("bigint").alias("batch_key")
    dst = ev.filter(F.col("ts") <= F.lit(WM)).select(key).distinct()
    batch = ev.filter(F.col("ts") > F.lit(WM)).select(
        key, "event_id", "user_id", "ts", "value")
    rn = F.row_number().over(
        Window.partitionBy("batch_key").orderBy("event_id"))
    first = batch.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
    return first.join(dst, "batch_key", "left_anti")


# --------------------------------------------------------------- row 16
@query(
    "core_stats_count_min_max",
    """SELECT COUNT(*) AS total_rows, MIN(ts) AS earliest,
              MAX(ts) AS latest FROM events""",
)
def core_stats_count_min_max(spark, sf_dir):
    """COUNT/MIN/MAX stats report (silver_transform.py:109-118)."""
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.min("ts").alias("earliest"),
        F.max("ts").alias("latest"),
    )


# --------------------------------------------------------------- row 18
@query(
    "core_join_fact_dim",
    f"""WITH dim AS ({DIM_TIME_SQL})
        SELECT e.ts, e.event_type, e.value,
               d.day_of_week, d.is_weekend, d.season
        FROM events e JOIN dim d ON e.ts = d.time_id""",
)
def core_join_fact_dim(spark, sf_dir):
    """Inner equi-join fact ⋈ dim_time (gold_aggr.py:96-97);
    the dim side is broadcast — no shuffle of the fact."""
    ev = t(spark, sf_dir, "events")
    dim = core_dim_time(spark, sf_dir).select(
        "time_id", "day_of_week", "is_weekend", "season")
    return ev.join(F.broadcast(dim), ev.ts == dim.time_id, "inner") \
             .select("ts", "event_type", "value",
                     "day_of_week", "is_weekend", "season")


# --------------------------------------------------------------- row 19
@query(
    "core_derived_ratio_guards",
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN l_quantity > 0
                   THEN l_extendedprice / l_quantity ELSE 0 END AS unit_price,
              CASE WHEN l_discount > 0
                   THEN l_tax / l_discount ELSE 1 END AS tax_discount_ratio
       FROM lineitem""",
)
def core_derived_ratio_guards(spark, sf_dir):
    """Divide-by-zero CASE guards with asymmetric defaults
    (ELSE 0 at gold_aggr.py:73-78, ELSE 1 at :180-184)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.when(F.col("l_quantity") > 0,
               F.col("l_extendedprice") / F.col("l_quantity"))
        .otherwise(F.lit(0.0)).alias("unit_price"),
        F.when(F.col("l_discount") > 0,
               F.col("l_tax") / F.col("l_discount"))
        .otherwise(F.lit(1.0)).alias("tax_discount_ratio"),
    )


# ----------------------------------------------------------- rows 20-21
@query(
    "core_moving_avg_5row",
    """SELECT event_id, ts,
              ROUND(AVG(value) OVER w, 6) AS avg_value_5,
              ROUND(STDDEV(value) OVER w, 6) AS stddev_value_5
       FROM events
       WINDOW w AS (ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
)
def core_moving_avg_5row(spark, sf_dir):
    """5-ROW trailing moving average + sample stddev, global ordering
    (gold_aggr.py:104-177).  Parity mode: unpartitioned window."""
    ev = t(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id").rowsBetween(-4, 0)
    return ev.select(
        "event_id", "ts",
        F.round(F.avg("value").over(w), 6).alias("avg_value_5"),
        F.round(F.stddev("value").over(w), 6).alias("stddev_value_5"),
    )


# ------------------------------------------------- rows 20-21 at scale
@query(
    "core_moving_avg_partitioned",
    """SELECT event_id, ts, event_type,
              ROUND(AVG(value) OVER w, 6) AS avg_value_5,
              ROUND(STDDEV(value) OVER w, 6) AS stddev_value_5
       FROM events
       WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
)
def core_moving_avg_partitioned(spark, sf_dir):
    """Partitioned trailing window — the shape that parallelizes at
    100 TB (SURVEY §4.3): one window task per key, not one global."""
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(-4, 0))
    return ev.select(
        "event_id", "ts", "event_type",
        F.round(F.avg("value").over(w), 6).alias("avg_value_5"),
        F.round(F.stddev("value").over(w), 6).alias("stddev_value_5"),
    )


# --------------------------------------- rows 20-21, exact at scale
@query(
    "core_moving_avg_bucket_parallel",
    """SELECT event_id, ts,
              ROUND(AVG(value) OVER w, 6) AS avg_value_5,
              ROUND(STDDEV(value) OVER w, 6) AS stddev_value_5
       FROM events
       WINDOW w AS (ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
)
def core_moving_avg_bucket_parallel(spark, sf_dir):
    """The reference's GLOBAL unpartitioned trailing window
    (gold_aggr.py:104-177), computed bucket-parallel: partition by
    day, replay each day's last 4 rows into the next as warm-up,
    window per day, drop warm-up (operators.windows).  Bit-identical
    to the single-task global window — the oracle here is the SAME
    SQL as ``core_moving_avg_5row`` — but every day computes in
    parallel, which is the only shape that survives 100 TB
    (SURVEY §4.3)."""
    from ..operators.windows import with_trailing_partitioned

    ev = t(spark, sf_dir, "events")

    def aggs(w):
        return [
            F.round(F.avg("value").over(w), 6).alias("avg_value_5"),
            F.round(F.stddev("value").over(w), 6).alias("stddev_value_5"),
        ]

    out = with_trailing_partitioned(ev, ["ts", "event_id"], 5, aggs)
    return out.select("event_id", "ts", "avg_value_5", "stddev_value_5")


# ----------------------------- rows 20-21, grouped AND day-parallel
@query(
    "core_moving_avg_grouped_scaled",
    """SELECT event_id, ts, event_type,
              ROUND(AVG(value) OVER w, 6) AS avg_value_5,
              ROUND(STDDEV(value) OVER w, 6) AS stddev_value_5
       FROM events
       WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
)
def core_moving_avg_grouped_scaled(spark, sf_dir):
    """PARTITION BY event_type trailing window computed at
    (event_type, day) grain: warm-up rows replay within their group
    only, so parallelism = groups x days instead of one task per
    group.  With few distinct groups (5 event types here; one
    ungrouped series in the reference) per-group windows are nearly
    as serial as the global one — this is the shape that actually
    scales.  Oracle = the plain per-type window."""
    from ..operators.windows import with_trailing_partitioned

    ev = t(spark, sf_dir, "events")

    def aggs(w):
        return [
            F.round(F.avg("value").over(w), 6).alias("avg_value_5"),
            F.round(F.stddev("value").over(w), 6).alias("stddev_value_5"),
        ]

    out = with_trailing_partitioned(
        ev, ["ts", "event_id"], 5, aggs, group_by=["event_type"])
    return out.select("event_id", "ts", "event_type",
                      "avg_value_5", "stddev_value_5")


# --------------------------------------------------------------- row 22
@query(
    "core_incremental_window",
    f"""WITH warm AS (
          SELECT event_id, ts, value FROM events
          WHERE ts > {WM_SQL} - INTERVAL 30 MINUTES),
        agged AS (
          SELECT event_id, ts,
                 ROUND(AVG(value) OVER (ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
                   AS avg_value_5
          FROM warm)
        SELECT event_id, ts, avg_value_5 FROM agged WHERE ts > {WM_SQL}""",
)
def core_incremental_window(spark, sf_dir):
    """Incremental window warm-up: read from cursor - lookback, window,
    then trim rows <= cursor (gold_aggr.py:98,219)."""
    ev = t(spark, sf_dir, "events")
    warm = ev.filter(
        F.col("ts") > F.lit(WM) - F.expr("INTERVAL 30 MINUTES"))
    w = Window.orderBy("ts", "event_id").rowsBetween(-4, 0)
    agged = warm.select(
        "event_id", "ts",
        F.round(F.avg("value").over(w), 6).alias("avg_value_5"))
    return agged.filter(F.col("ts") > F.lit(WM))


# --------------------------------------------------------------- row 12
@query(
    "core_distinct",
    """SELECT DISTINCT event_type, CAST(ts AS DATE) AS event_date
       FROM events""",
)
def core_distinct(spark, sf_dir):
    """DISTINCT projection (silver_transform.py:63)."""
    ev = t(spark, sf_dir, "events")
    return ev.select("event_type",
                     F.to_date("ts").alias("event_date")).distinct()


# ---------------------------------------------------------- rows 23-24
@query(
    "core_ordered_export",
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_returnflag
       FROM lineitem
       WHERE l_returnflag = 'R'
       ORDER BY l_shipdate, l_orderkey, l_linenumber""",
)
def core_ordered_export(spark, sf_dir):
    """Ordered export projection (gold_aggr.py:234-254) — the sort
    that feeds the CSV sink."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_returnflag") == "R")
            .select("l_orderkey", "l_linenumber", "l_shipdate",
                    "l_returnflag")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber"))


# ----------------------------------------------- row 16 at group grain
@query(
    "core_groupby_agg",
    f"""SELECT l_returnflag, l_linestatus,
               {DSUM_SQL.format(expr="l_quantity")} AS sum_qty,
               {DSUM_SQL.format(expr="l_extendedprice")} AS sum_base_price,
               {DSUM_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
                 AS sum_disc_price,
               ROUND({DDOUBLE_SQL.format(
                   expr=DSUM_RAW_SQL.format(expr="l_quantity"))}
                     / CAST(COUNT(*) AS DOUBLE), 6) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus""",
)
def core_groupby_agg(spark, sf_dir):
    """Hash aggregation with partial (map-side) combine — TPC-H Q1
    shape; exact DECIMAL accumulation surfaced as DOUBLE."""
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum(disc, "sum_disc_price"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)).cast("double"), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# fixed-point twin of core_groupby_agg: the DECIMAL(38,10) hash
# accumulator is exact at any scale but costs ~0.9s of the query's
# 1.14s at sf0.1 (Spark's >18-digit decimal sum is a non-vectorized
# BigDecimal path; DuckDB's int128 path is vectorized — measured
# breakdown in SURVEY §8).  Production variant: pre-round each term
# to its EXACT decimal scale (prices 2dp, discounted revenue 4dp),
# accumulate as scaled BIGINT — order-independent, deterministic,
# native codegen — and rescale once per group.  Bound: the long
# accumulator holds ~8e9 rows/group at the 1e4 scale; past that use
# the decimal variant (documented, not hidden).
@query(
    "core_groupby_agg_fastsum",
    """SELECT l_returnflag, l_linestatus,
              ROUND(CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 100, 6) AS sum_qty,
              ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 100, 6) AS sum_base_price,
              ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice
                    * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 10000, 6) AS sum_disc_price,
              ROUND(CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 100 / COUNT(*), 6)
                AS avg_qty,
              COUNT(*) AS count_order
       FROM lineitem
       GROUP BY l_returnflag, l_linestatus""",
)
def core_groupby_agg_fastsum(spark, sf_dir):
    """TPC-H Q1 shape with fixed-point scaled-long accumulation —
    the production twin of core_groupby_agg (3.5x faster at sf0.1:
    0.32s vs 1.14s; see SURVEY §8 stage breakdown).  floor(x*s+0.5)
    is identical IEEE arithmetic on both engines, so the scaled
    integers (and their exact BIGINT sums) hash-match
    deterministically at any addition order."""
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def fsum(col, scale, alias):
        return F.round(
            F.sum(F.floor(col * scale + 0.5).cast("long"))
            .cast("double") / scale, 6).alias(alias)

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        fsum(F.col("l_quantity"), 100, "sum_qty"),
        fsum(F.col("l_extendedprice"), 100, "sum_base_price"),
        fsum(disc, 10000, "sum_disc_price"),
        F.round(F.sum(F.floor(F.col("l_quantity") * 100 + 0.5)
                      .cast("long")).cast("double") / 100
                / F.count(F.lit(1)), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------- row 17
@query(
    "core_cte_chain",
    f"""WITH daily AS (
          SELECT n_name,
                 CAST(o_orderdate AS DATE) AS order_day,
                 SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(38,10))) AS rev
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          GROUP BY n_name, CAST(o_orderdate AS DATE))
        SELECT n_name,
               DATE_TRUNC('month', order_day) AS order_month,
               ROUND(CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE), 6)
                 AS revenue,
               COUNT(*) AS n_days
        FROM daily
        GROUP BY n_name, DATE_TRUNC('month', order_day)""",
)
def core_cte_chain(spark, sf_dir):
    """CTE chaining (gold_aggr.py:68-218): multi-join star query with
    two aggregation grains.  Revenue is PRE-AGGREGATED per orderkey
    BELOW the star join (legal: the discounted-revenue sum
    decomposes per order, and n_name/order_day are order-grain
    attributes; DECIMAL accumulation is exact so sum-of-sums is
    bit-equal — pinned by the oracle hash).  That collapses the
    lineitem stream to order cardinality before it touches any join
    or the two grain aggregations — measured 20-30% faster at every
    scale point from sf0.1 to x100 (SCALE_r09), and at 100 TB it is
    the difference between shuffling the fact table once into a
    4x-smaller join pipeline vs dragging 4 rows/order through three
    joins.  nation (bounded) broadcasts by hint; customer is
    SF-proportional so its join is unhinted — the planner broadcasts
    it while it fits the (stock 10 MB) threshold and shuffle-joins
    beyond, which the x10 rehearsal measured as the right knee."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(38,10)")
    rev_po = li.groupBy("l_orderkey").agg(F.sum(disc).alias("rev_o"))
    daily = (
        rev_po.join(orders, rev_po.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("order_day"))
        .agg(F.sum("rev_o").alias("rev"))
    )
    return (
        daily.groupBy("n_name",
                      F.trunc("order_day", "month").alias("order_month"))
        .agg(F.round(F.sum("rev").cast("double"), 6).alias("revenue"),
             F.count(F.lit(1)).alias("n_days"))
    )


# fixed-point twin of core_cte_chain (same rationale as
# core_groupby_agg_fastsum; discounted revenue is exactly 4dp so the
# 1e4-scaled BIGINT accumulator is exact).  Round-9 crossover data
# (SCALE_r09): the residual gap vs the DuckDB oracle is the JVM
# star-join/agg constant factor, shrinking 7.3x -> 6.5x -> 4.4x
# across sf0.1/x10/x100 — single-node DuckDB stays ahead on this
# shape; Spark's case is the >1-node scale the oracle cannot reach.
@query(
    "core_cte_chain_fastsum",
    """WITH daily AS (
         SELECT n_name,
                CAST(o_orderdate AS DATE) AS order_day,
                SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                               * 10000 + 0.5) AS BIGINT)) AS rev_s
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         GROUP BY n_name, CAST(o_orderdate AS DATE))
       SELECT n_name,
              DATE_TRUNC('month', order_day) AS order_month,
              ROUND(CAST(SUM(rev_s) AS DOUBLE) / 10000, 6) AS revenue,
              COUNT(*) AS n_days
       FROM daily
       GROUP BY n_name, DATE_TRUNC('month', order_day)""",
)
def core_cte_chain_fastsum(spark, sf_dir):
    """core_cte_chain with fixed-point scaled-long revenue sums —
    the production variant of the two-grain star aggregation.  Same
    per-orderkey pre-aggregation below the join as the anchor twin
    (BIGINT partials are order-independent and exact, so the
    decomposition is bit-equal); measured sf0.1 1.18 -> 0.92s,
    x10 2.33 -> 1.69s, x100 5.72 -> 4.02s (SCALE_r09)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_po = li.groupBy("l_orderkey").agg(
        F.sum(F.floor(disc * 10000 + 0.5).cast("long")).alias("rev_o"))
    daily = (
        rev_po.join(orders, rev_po.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("order_day"))
        .agg(F.sum("rev_o").alias("rev_s"))
    )
    return (
        daily.groupBy("n_name",
                      F.trunc("order_day", "month").alias("order_month"))
        .agg(F.round(F.sum("rev_s").cast("double") / 10000, 6)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_days"))
    )


# ------------------------------------------------------ MERGE upsert
MERGE_SQL = f"""
WITH target AS (
  SELECT user_id, event_type, COUNT(*) AS n_events,
         ROUND(AVG(value), 6) AS avg_value
  FROM events WHERE ts <= {WM_SQL} AND value IS NOT NULL
  GROUP BY user_id, event_type),
source AS (
  SELECT user_id, event_type, COUNT(*) AS n_events,
         ROUND(AVG(value), 6) AS avg_value
  FROM events WHERE ts > {WM_SQL} AND value IS NOT NULL
  GROUP BY user_id, event_type)
SELECT COALESCE(t.user_id, s.user_id) AS user_id,
       COALESCE(t.event_type, s.event_type) AS event_type,
       COALESCE(s.n_events, t.n_events) AS n_events,
       COALESCE(s.avg_value, t.avg_value) AS avg_value
FROM target t FULL OUTER JOIN source s
  ON t.user_id = s.user_id AND t.event_type = s.event_type
"""


@query("core_merge_upsert", MERGE_SQL)
def core_merge_upsert(spark, sf_dir):
    """MERGE / upsert semantics (UPDATE matched + INSERT new + keep
    unmatched target) as a single full-outer join on the merge key —
    ``io.merge_upsert_plan``.  The scenario is the incremental
    refresh the reference's ON CONFLICT DO NOTHING cannot express:
    per-(user, type) stats where the fresh batch REPLACES stale rows
    instead of being dropped.  One co-partitioned shuffle on the key;
    AQE broadcasts the changeset side when it is small.  The atomic
    publish half (staged write + rename swap) is
    ``io.publish_atomic``, exercised in tests/test_io_merge.py."""
    from ..io import merge_upsert_plan

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def snap(pred):
        return (ev.filter(pred)
                .groupBy("user_id", "event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.round(F.avg("value"), 6).alias("avg_value")))

    target = snap(F.col("ts") <= F.lit(WM))
    source = snap(F.col("ts") > F.lit(WM))
    return merge_upsert_plan(target, source, ["user_id", "event_type"])

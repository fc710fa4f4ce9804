"""TPC-H-derived analytic query shapes over the synthetic star schema.

The reference's parity surface (SURVEY.md §2) stops at one fact⋈dim
join; these queries promote the classic multi-way-join + aggregate
shapes (TPC-H Q1/Q3/Q5/Q10, adapted to the driver's column subset —
no partsupp, no comment/address columns) to first-class verified
operators, because they are the shapes that dominate a 100 TB
warehouse workload:

* Q1  — full-scan grouped aggregate (partial agg does ~all the work
        map-side; the shuffle carries 4 groups);
* Q3  — selective dim filter → fact join → top-k (broadcast the
        filtered customer side, takeOrdered instead of global sort);
* Q5  — 6-way snowflake join (region→nation→customer and supplier
        broadcast; the only shuffle joins are orders⋈lineitem);
* Q10 — join + group-by-customer + top-k revenue.

Float parity: money sums go through DECIMAL(38,10) (exact,
order-independent); averages divide the exact decimal by the count
in DOUBLE and round to 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .core import dsum, t
from . import query

# ------------------------------------------------------------------ Q1
Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE), 6) AS sum_qty,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE), 6) AS sum_base_price,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE), 6) AS sum_disc_price,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE), 6) AS sum_charge,
       ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
             / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
             / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", Q1_SQL)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single-table grouped aggregate with derived
    measures.  4 output groups — partial (map-side) aggregation
    reduces ~everything before the shuffle, so the plan is scan-bound
    at any scale; the shipdate predicate pushes to parquet."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))

    def davg(c, alias):
        return F.round(
            F.sum(c.cast("decimal(38,10)")).cast("double") / n, 6
        ).alias(alias)

    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00")
                  .cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity"), "sum_qty"),
             dsum(F.col("l_extendedprice"), "sum_base_price"),
             dsum(disc_price, "sum_disc_price"),
             dsum(charge, "sum_charge"),
             davg(F.col("l_quantity"), "avg_qty"),
             davg(F.col("l_extendedprice"), "avg_price"),
             davg(F.col("l_discount"), "avg_disc"),
             n.alias("count_order"))
    )


# ------------------------------------------------------------------ Q3
Q3_DATE = "1996-06-30 00:00:00"

Q3_SQL = f"""
SELECT l_orderkey,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE), 6) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", Q3_SQL)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter → fact join →
    global top-k.  The filtered customer keys broadcast (no shuffle
    of orders on custkey); the top-10 runs as takeOrdered (per-
    partition heaps merged on the driver), never a global sort."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cutoff = F.lit(Q3_DATE).cast("timestamp")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING") \
                   .select("c_custkey")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff)
              .join(F.broadcast(building),
                    F.col("o_custkey") == F.col("c_custkey"))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate",
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ------------------------------------------------------------------ Q5
Q5_SQL = """
SELECT n_name,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE), 6) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query("tpch_q5_local_supplier", Q5_SQL)
def tpch_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way snowflake join with the co-location
    constraint c_nationkey = s_nationkey.  All four dimension-side
    tables (region→nation, supplier, customer) broadcast; the only
    shuffle join is orders⋈lineitem on orderkey — at 100 TB that is
    the single repartition the query needs, and AQE picks the
    build side."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    nations = (nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    supp_n = supp.join(F.broadcast(nations),
                       F.col("s_nationkey") == F.col("n_nationkey")) \
                 .select("s_suppkey", "s_nationkey", "n_name")
    o_filt = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00")
         .cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00")
           .cast("timestamp")))
    o_cust = o_filt.join(F.broadcast(cust),
                         F.col("o_custkey") == F.col("c_custkey")) \
                   .select("o_orderkey", "c_nationkey")
    return (
        li.join(o_cust, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )


# ----------------------------------------------------------------- Q10
Q10_SQL = """
SELECT c_custkey, c_name,
       ROUND(CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE), 6) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("tpch_q10_returned_items", Q10_SQL)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top-20.
    Quarter-filtered orders join lineitem on orderkey (shuffle);
    customer and nation broadcast onto the aggregated (small) result
    — enriching AFTER the group-by keeps the shuffle rows narrow."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    nation = t(spark, sf_dir, "nation")
    o_filt = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00")
         .cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00")
           .cast("timestamp"))).select("o_orderkey", "o_custkey")
    rev_per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o_filt, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )
    enriched = (
        rev_per_cust
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
    return enriched.orderBy(F.col("revenue").desc(), "c_custkey") \
                   .limit(20)


# ------------------------------------------------------------------ Q6
Q6_SQL = """
SELECT ROUND(CAST(CAST(SUM(CAST(l_extendedprice * l_discount
                        AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE), 6)
       AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", Q6_SQL)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.  All
    three predicates push to the parquet reader (min/max row-group
    skipping on shipdate) and the single scalar aggregate reduces
    map-side — the 100 TB plan is one scan stage and a 1-row
    shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00")
             .cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00")
               .cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"),
                  "revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


# ----------------------------------------------------------------- Q14
Q14_SQL = """
SELECT ROUND(
         100.0 * CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0 END AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE), 6)
       AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@query("tpch_q14_promo_effect", Q14_SQL)
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact⋈dim join.
    The month filter prunes lineitem first; part broadcasts (it is
    the bounded dimension), so the plan is one scan + broadcast hash
    join + map-side partial agg into a single row — no fact-side
    shuffle at any scale."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00")
         .cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00")
           .cast("timestamp")))
    joined = filtered.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"))
    num = F.sum(promo.cast("decimal(38,10)")).cast("double")
    den = F.sum(disc.cast("decimal(38,10)")).cast("double")
    return joined.agg(
        F.round(100.0 * num / den, 6).alias("promo_revenue"))


# ----------------------------------------------------------------- Q17
Q17_SQL = """
SELECT ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE) / 7.0, 6) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#4'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


@query("tpch_q17_small_qty_revenue", Q17_SQL)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated aggregate subquery decorrelated
    into a per-part average join.  The per-partkey AVG is a partial
    agg whose output has dimension cardinality, so it broadcasts back
    onto the brand-filtered fact rows — the correlated subquery never
    re-executes per row (the classic decorrelation Catalyst also
    applies to IN/EXISTS)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#4") \
                      .select("p_partkey")
    # per-part avg over ALL lineitem (the subquery is not brand-
    # filtered on the inside in TPC-H; keep the same semantics)
    avg_qty = (li.groupBy("l_partkey")
               .agg((0.2 * F.avg("l_quantity")).alias("qty_cap"))
               .withColumnRenamed("l_partkey", "cap_partkey"))
    return (
        li.join(F.broadcast(brand_parts),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty),
              F.col("l_partkey") == F.col("cap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,10)"))
                .cast("double") / 7.0, 6).alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_rows"))
    )


# ----------------------------------------------------------------- Q18
Q18_QTY = 250

Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE), 6) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(l_quantity) > {Q18_QTY})
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("tpch_q18_large_volume_customer", Q18_SQL)
def tpch_q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered semi-join back onto the fact.
    The per-order quantity sums reuse the SAME shuffle partitioning
    as the final group-by (both key on l_orderkey), so the plan pays
    one fact shuffle; the surviving (rare) large orders and customer
    broadcast."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)"))
                      .alias("oq"))
                 .filter(F.col("oq") > Q18_QTY)
                 .select(F.col("l_orderkey").alias("big_orderkey"),
                         F.round(F.col("oq").cast("double"), 6)
                         .alias("total_qty")))
    return (
        per_order
        .join(orders, F.col("big_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )

"""Probabilistic-sketch operators: HyperLogLog-style distinct
counting, count-min heavy hitters, Bloom-filter semi-join
pre-filtering.

Sketches are THE 100 TB tool: constant-size summaries that replace
corpus-sized state (exact distinct sets, full frequency maps, join
build sides) with a few KB that merge associatively — a sketch
partial from every partition combines on one reducer regardless of
data volume.  Every operator here is *deterministic* given its hash
function (registers are MAX/SUM/MIN aggregates of md5-derived
integers — order-independent), so unlike typical randomized-sketch
implementations they are exactly oracle-pairable: the DuckDB SQL
computes the identical sketch bit-for-bit, and the driver
hash-verifies estimate AND error columns.

Engine-portable hashing: slices of ``md5`` (see
functions/hashing.py) — never Spark-private hashes.  All pure
Catalyst expressions; nothing drops to Python.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from . import query, register_oracle_knee
from .core import t
from .text import TOKENS_SQL, tokens_col


def _next_pow2(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(max(1, n))))


# ------------------------------------------------- corpus-adaptive
# sketch sizing (r07 verdict #4, on the minhash_params pattern):
# every sizing knob keys on a FOOTER statistic of its build input
# (row count or column byte mass — a driver-side peek, no job).
# Below an explicit knee the TEST-SCALE constant is returned, so the
# static SQL oracles stay bit-valid at every parity SF; above it the
# sketch grows with its input so the 100 TB instance keeps its
# design error instead of silently saturating (the r06/r07 finding:
# a fixed 8192-bit Bloom filter is fp~1 — a no-op pre-filter — at a
# few hundred thousand build keys).  Each knee is registered in
# ORACLE_SCALE_KNEES so a parity run past it fails LOUDLY.

# --------------------------------------------------------------- HLL
#: 2^6 = 64 registers; the standard bias constant alpha_64 = 0.709.
HLL_BUCKETS = 64
HLL_ALPHA = 0.709
#: value slice is 12 hex digits = 48 bits; rho caps at 49 when v = 0.
HLL_VBITS = 48
#: orders rows up to which the 64-register test-scale sketch holds
#: its ~13% (1.04/sqrt(64)) design error comfortably; above it the
#: register count scales with the corpus (cheap: m ints of state).
HLL_KNEE_ROWS = 32_768
#: standard max precision p=14 (16384 registers).
HLL_MAX_BUCKETS = 1 << 14


def hll_params(n_rows: int) -> tuple[int, float]:
    """(register count, alpha bias constant) for a corpus of
    ``n_rows`` build rows: the test-scale (64, 0.709) below the
    knee — oracle-exact — else registers grow ~linearly with the
    corpus (power of two, capped at p=14) with the matching
    alpha_m = 0.7213/(1 + 1.079/m) from the HLL paper."""
    if n_rows <= HLL_KNEE_ROWS:
        return HLL_BUCKETS, HLL_ALPHA
    m = min(HLL_BUCKETS * _next_pow2(-(-n_rows // HLL_KNEE_ROWS)),
            HLL_MAX_BUCKETS)
    return m, 0.7213 / (1 + 1.079 / m)

HLL_SQL = f"""
WITH h AS (
  SELECT o_orderpriority AS grp,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4))
              ::BIGINT % {HLL_BUCKETS} AS INTEGER) AS bucket,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 5, 12))
              ::BIGINT AS v
  FROM orders),
regs AS (
  SELECT grp, bucket,
         MAX(CASE WHEN v = 0 THEN {HLL_VBITS + 1}
                  ELSE CAST(FLOOR(log2(v & (-v)) + 0.5) AS INTEGER) + 1
             END) AS m
  FROM h GROUP BY grp, bucket),
spine AS (
  SELECT g.grp, r.range AS bucket
  FROM (SELECT DISTINCT o_orderpriority AS grp FROM orders) g
  CROSS JOIN range({HLL_BUCKETS}) r),
full_regs AS (
  SELECT s.grp, s.bucket, COALESCE(regs.m, 0) AS m
  FROM spine s LEFT JOIN regs ON regs.grp = s.grp
                             AND regs.bucket = s.bucket),
est AS (
  SELECT grp,
         CAST(SUM(CAST(POW(2.0, {HLL_VBITS + 1} - m) AS BIGINT))
              AS DOUBLE) / POW(2.0, {HLL_VBITS + 1}) AS s
  FROM full_regs GROUP BY grp),
ex AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY grp)
SELECT ex.grp AS o_orderpriority, ex.n_exact,
       ROUND({HLL_ALPHA} * {HLL_BUCKETS} * {HLL_BUCKETS} / est.s, 4)
         AS hll_estimate,
       ROUND(({HLL_ALPHA} * {HLL_BUCKETS} * {HLL_BUCKETS} / est.s
              - ex.n_exact) / ex.n_exact, 4) AS rel_error
FROM ex JOIN est ON est.grp = ex.grp
"""


@query("sketch_hll_distinct", HLL_SQL)
def sketch_hll_distinct(spark, sf_dir):
    """HyperLogLog-style distinct-customer estimate per order
    priority, verified against the exact COUNT(DISTINCT).

    Register design (Flajolet-Martin rho over iid hash bits — the
    trailing-zero run has the same geometric distribution as the
    leading-zero run HLL papers use, so alpha_64 applies): bucket =
    16 hash bits mod {HLL_BUCKETS}, rho = 1 + trailing zeros of an
    independent 48-bit slice, register = MAX(rho) per bucket.  MAX
    is order-independent and duplicate-insensitive — the reason
    sketch merges are free — so no DISTINCT pass is needed and the
    plan is one shuffle of (group, bucket) registers, {HLL_BUCKETS}
    rows per group, regardless of fact-table volume.  At 100 TB the
    map side emits register partials and the reduce side merges
    {HLL_BUCKETS} ints per group: the state that replaces a
    billion-row distinct set.

    Float discipline: 2^-M terms are summed as EXACT scaled BIGINTs
    (2^(49-M), all integers), so the harmonic sum is
    order-independent; lowbit = v & -v is a power of two whose
    log2 is float-exact, rounded half-up to int on both engines.
    The estimator is the raw harmonic-mean formula (no small/large
    range corrections) on both sides, so estimates match bit-for-bit
    and the rel_error column is itself verified.

    Register count is corpus-adaptive (hll_params, knee registered
    in ORACLE_SCALE_KNEES): the footer row count of the build table
    sizes m so estimate precision survives scale-up while the
    test-scale sketch stays oracle-exact."""
    from ..io import parquet_row_count

    n_rows = parquet_row_count(os.path.join(sf_dir, "orders.parquet"))
    m_regs, alpha = hll_params(n_rows)
    o = t(spark, sf_dir, "orders")
    md = F.md5(F.col("o_custkey").cast("string"))
    h = o.select(
        F.col("o_orderpriority").alias("grp"),
        (F.conv(F.substring(md, 1, 4), 16, 10).cast("bigint")
         % m_regs).cast("int").alias("bucket"),
        F.conv(F.substring(md, 5, 12), 16, 10).cast("bigint").alias("v"))
    rho = (F.when(F.col("v") == 0, F.lit(HLL_VBITS + 1))
           .otherwise(F.floor(F.log2(F.expr("v & (-v)")) + F.lit(0.5))
                      .cast("int") + 1))
    regs = h.groupBy("grp", "bucket").agg(F.max(rho).alias("m"))
    spine = (o.select(F.col("o_orderpriority").alias("grp")).distinct()
             .select("grp", F.explode(
                 F.sequence(F.lit(0), F.lit(m_regs - 1)))
                 .alias("bucket")))
    full = (spine.join(regs, ["grp", "bucket"], "left")
            .select("grp", F.coalesce(F.col("m"), F.lit(0)).alias("m")))
    est = full.groupBy("grp").agg(
        (F.sum(F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1) - F.col("m"))
               .cast("bigint")).cast("double")
         / F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1))).alias("s"))
    ex = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact"))
    e = F.lit(alpha * m_regs * m_regs) / F.col("s")
    return (ex.join(est, "grp")
            .select(F.col("grp").alias("o_orderpriority"), "n_exact",
                    F.round(e, 4).alias("hll_estimate"),
                    F.round((e - F.col("n_exact"))
                            / F.col("n_exact"), 4).alias("rel_error")))


# ----------------------------------------------------- KMV (theta)
#: sketch size: the k smallest distinct hash fractions are kept.
KMV_K = 32
#: hash domain: 14 hex digits = 56 bits.
KMV_DOMAIN_BITS = 56

KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))
           ::BIGINT AS hv
  FROM events),
rk AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv)
           AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n_seen
  FROM h),
kth AS (
  SELECT event_type, n_seen,
         CAST(hv AS DOUBLE) / POW(2.0, {KMV_DOMAIN_BITS}) AS fk
  FROM rk WHERE r = {KMV_K} OR (n_seen < {KMV_K} AND r = n_seen)),
ex AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type)
SELECT ex.event_type, ex.n_exact,
       ROUND(CASE WHEN kth.n_seen < {KMV_K}
                  THEN CAST(kth.n_seen AS DOUBLE)
                  ELSE ({KMV_K} - 1) / kth.fk END, 4) AS kmv_estimate,
       ROUND((CASE WHEN kth.n_seen < {KMV_K}
                   THEN CAST(kth.n_seen AS DOUBLE)
                   ELSE ({KMV_K} - 1) / kth.fk END
              - ex.n_exact) / ex.n_exact, 4) AS rel_error
FROM ex JOIN kth ON kth.event_type = ex.event_type
"""


@query("sketch_kmv_distinct", KMV_SQL)
def sketch_kmv_distinct(spark, sf_dir):
    """KMV / bottom-k (theta-sketch family) distinct-user estimate
    per event type: keep the {KMV_K} smallest distinct hash values;
    n-hat = (k-1) / f_(k) where f_(k) is the k-th smallest hash
    fraction (Bar-Yossef et al. '02).  Groups with fewer than k
    distinct values are exact by construction (the sketch holds the
    whole set) — that degenerate branch is part of the contract and
    is verified too.

    Complements the HLL entry with the OTHER classic distinct
    sketch: KMV's k values support set algebra (union = merge-keep-k,
    intersection via the Jaccard of kept values) that HLL registers
    don't, at k words of state instead of m registers.  The k
    smallest values of a set are order- and duplicate-independent,
    so the sketch is deterministic given the hash and exactly
    oracle-pairable.

    Scale shape: DISTINCT (group, hash) with map-side combine, then
    a bounded per-group top-k — at scale the top-k is a partial
    bottom-k per partition merged on one reducer per group (k words
    each), never a corpus-sized sort.  Int->double conversion of the
    56-bit hash is correctly rounded IEEE on both engines, so f_(k)
    matches bit-for-bit."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    h = (e.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                           1, 14), 16, 10).cast("bigint").alias("hv"))
        .distinct())
    w = Window.partitionBy("event_type").orderBy("hv")
    wn = Window.partitionBy("event_type")
    rk = (h.withColumn("r", F.row_number().over(w))
          .withColumn("n_seen", F.count(F.lit(1)).over(wn)))
    kth = (rk.filter((F.col("r") == KMV_K)
                     | ((F.col("n_seen") < KMV_K)
                        & (F.col("r") == F.col("n_seen"))))
           .select("event_type", "n_seen",
                   (F.col("hv").cast("double")
                    / F.pow(F.lit(2.0), KMV_DOMAIN_BITS)).alias("fk")))
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact"))
    est = (F.when(F.col("n_seen") < KMV_K,
                  F.col("n_seen").cast("double"))
           .otherwise(F.lit(KMV_K - 1) / F.col("fk")))
    return (ex.join(kth, "event_type")
            .select("event_type", "n_exact",
                    F.round(est, 4).alias("kmv_estimate"),
                    F.round((est - F.col("n_exact"))
                            / F.col("n_exact"), 4).alias("rel_error")))


# --------------------------------------------------------- count-min
#: depth (independent hash rows) and width (counters per row).
CM_DEPTH = 3
CM_WIDTH = 512
#: heavy hitters reported (exact top-k is the verification target).
CM_TOPK = 20
#: per-cell load target (expected total count / width) the adaptive
#: width preserves, and the text-byte mass up to which the 512-wide
#: test-scale grid already meets it: 512 cells x 64 load x ~6 bytes
#: per bigram-producing text byte (knee on MASS, not doc count —
#: bigram volume scales with text bytes, the r06 gram lesson).
CM_TARGET_LOAD = 64
CM_KNEE_TEXT_BYTES = CM_WIDTH * CM_TARGET_LOAD * 6  # = 196_608
CM_MAX_WIDTH = 1 << 24


def cm_params(text_bytes: int) -> int:
    """Count-min width for a corpus of ``text_bytes`` logical text:
    the test-scale {CM_WIDTH} below the knee (oracle-exact), else a
    power of two keeping the expected per-cell load (~total bigrams
    / width, the additive-overshoot driver) at its test-scale value
    — a fixed 512-wide grid at 1000x the corpus would carry 1000x
    the collision mass in every counter, turning MIN-over-rows
    estimates into pure noise."""
    if text_bytes <= CM_KNEE_TEXT_BYTES:
        return CM_WIDTH
    est_bigrams = text_bytes // 6
    return min(max(CM_WIDTH, _next_pow2(est_bigrams // CM_TARGET_LOAD)),
               CM_MAX_WIDTH)

_CM_CELLS_SQL = "\nUNION ALL\n".join(
    f"""SELECT {r} AS r,
       CAST(('0x' || substr(md5('cm{r}:' || big), 1, 14))::BIGINT
            % {CM_WIDTH} AS INTEGER) AS c,
       cnt FROM bc"""
    for r in range(CM_DEPTH))

CM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_transform({TOKENS_SQL}, x -> lower(x)) AS ts
  FROM documents),
bg AS (
  SELECT ts[i] || ' ' || ts[i + 1] AS big
  FROM toks, LATERAL unnest(range(1, len(ts))) AS u(i)),
bc AS (SELECT big, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM bg GROUP BY big),
cells AS (
  SELECT r, c, SUM(cnt) AS cell FROM ({_CM_CELLS_SQL}) GROUP BY r, c),
topk AS (
  SELECT big, cnt FROM bc
  ORDER BY cnt DESC, big LIMIT {CM_TOPK}),
probe AS (
  SELECT t.big, t.cnt, cells.cell
  FROM topk t, range({CM_DEPTH}) r
  JOIN cells
    ON cells.r = r.range
   AND cells.c = CAST(('0x' || substr(
          md5('cm' || CAST(r.range AS VARCHAR) || ':' || t.big),
          1, 14))::BIGINT % {CM_WIDTH} AS INTEGER))
SELECT big AS bigram, CAST(cnt AS BIGINT) AS exact_cnt,
       CAST(MIN(cell) AS BIGINT) AS cm_estimate,
       CAST(MIN(cell) - cnt AS BIGINT) AS overshoot
FROM probe GROUP BY big, cnt
"""


@query("sketch_countmin_heavy_hitters", CM_SQL)
def sketch_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch (Cormode & Muthukrishnan '05) over document
    bigram frequencies: a {CM_DEPTH} x {CM_WIDTH} counter grid
    (counter = SUM of counts hashing to the cell — pure additive, so
    partials merge associatively at any parallelism), probed for the
    exact top-{CM_TOPK} bigrams.  The verified ``overshoot`` column
    is the sketch's signature guarantee: estimate >= exact always
    (hash collisions only ADD), with the excess bounded by
    sum(counts)/width per row and the MIN over rows tightening it.

    Scale shape: the corpus-sized work is the bigram count (one
    (bigram) shuffle with map-side combine — same shape as every
    n-gram operator here); the sketch itself is {CM_DEPTH} x
    width cells built from vocabulary-cardinality input, and
    the probe joins {CM_TOPK} rows against it.  At 100 TB the grid
    replaces a billion-entry frequency map as the shippable
    summary.  Width is corpus-adaptive (cm_params — keyed on footer
    text MASS so the per-cell collision load stays at its design
    value; knee in ORACLE_SCALE_KNEES)."""
    from ..io import parquet_column_bytes

    width = cm_params(parquet_column_bytes(
        os.path.join(sf_dir, "documents.parquet"), "text"))
    d = t(spark, sf_dir, "documents")
    ts = F.transform(tokens_col(F.col("text")), lambda x: F.lower(x))
    toks = d.select(ts.alias("ts"))
    # Guard size(ts) < 2: sequence(1, 0) counts DOWN in Spark
    # (yielding index 0 -> INVALID_INDEX_OF_ZERO), while DuckDB's
    # range(1, len) is empty — same trap as dedup.py:113.
    bg = (toks.select(F.explode(F.expr(
        "CASE WHEN size(ts) >= 2 THEN "
        "transform(sequence(1, size(ts) - 1), "
        "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))) "
        "ELSE array() END"))
        .alias("big")))
    bc = bg.groupBy("big").agg(F.count(F.lit(1)).cast("bigint")
                               .alias("cnt"))

    def cell_of(r, col):
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"cm{r}:"), col)), 1, 14), 16, 10)
            .cast("bigint") % width).cast("int")

    cells = (bc.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 cell_of(r, F.col("big")).alias("c"))
        for r in range(CM_DEPTH)])).alias("rc"), "cnt")
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.sum("cnt").alias("cell")))
    topk = bc.orderBy(F.col("cnt").desc(), "big").limit(CM_TOPK)
    probes = (topk.select("big", "cnt", F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 cell_of(r, F.col("big")).alias("c"))
        for r in range(CM_DEPTH)])).alias("rc")))
    est = (probes.join(F.broadcast(cells),
                       (F.col("rc.r") == F.col("r"))
                       & (F.col("rc.c") == F.col("c")))
           .groupBy("big", "cnt").agg(F.min("cell").alias("cm")))
    return est.select(
        F.col("big").alias("bigram"),
        F.col("cnt").cast("bigint").alias("exact_cnt"),
        F.col("cm").cast("bigint").alias("cm_estimate"),
        (F.col("cm") - F.col("cnt")).cast("bigint").alias("overshoot"))


# ------------------------------------------------------------- Bloom
#: filter size in bits and number of hash probes per key.
BLOOM_BITS = 8192
BLOOM_K = 3
#: dim-side predicate: the customer segment whose orders we want.
BLOOM_SEGMENT = "BUILDING"
#: dim rows up to which the 8192-bit test-scale filter keeps a sane
#: fp rate, and the bits-per-key the adaptive size provisions above
#: it (k=3, m/n=12 -> fp = (1-e^(-1/4))^3 ~ 1.1%); n is the FULL dim
#: row count from the footer — an upper bound on the filtered build
#: keys, so the filter is only ever over-provisioned.
BLOOM_KNEE_ROWS = 2048
BLOOM_BITS_PER_KEY = 12
BLOOM_MAX_BITS = 1 << 30


def bloom_params(n_dim_rows: int) -> int:
    """Filter size in bits for ``n_dim_rows`` build-side rows: the
    test-scale {BLOOM_BITS} below the knee (oracle-exact), else the
    next power of two of {BLOOM_BITS_PER_KEY} bits/key — the r06/r07
    finding this closes: a FIXED 8192-bit filter saturates (fp -> 1)
    at a few hundred thousand keys, silently turning the 100 TB
    semi-join pre-filter into a no-op that admits everything."""
    if n_dim_rows <= BLOOM_KNEE_ROWS:
        return BLOOM_BITS
    return min(_next_pow2(n_dim_rows * BLOOM_BITS_PER_KEY),
               BLOOM_MAX_BITS)

_BLOOM_POS_SQL = "\nUNION\n".join(
    f"""SELECT ('0x' || substr(md5('bl{i}:' || CAST(c_custkey AS VARCHAR)),
                1, 14))::BIGINT % {BLOOM_BITS} AS pos FROM keys"""
    for i in range(BLOOM_K))

_BLOOM_PROBE_POS = ", ".join(
    f"""('0x' || substr(md5('bl{i}:' || CAST(o_custkey AS VARCHAR)),
         1, 14))::BIGINT % {BLOOM_BITS} AS p{i}"""
    for i in range(BLOOM_K))

BLOOM_SQL = f"""
WITH keys AS (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = '{BLOOM_SEGMENT}'),
bpos AS ({_BLOOM_POS_SQL}),
probe AS (
  SELECT o_orderkey, o_custkey, {_BLOOM_PROBE_POS}
  FROM orders),
flags AS (
  SELECT o_orderkey,
         CASE WHEN p0 IN (SELECT pos FROM bpos)
               AND p1 IN (SELECT pos FROM bpos)
               AND p2 IN (SELECT pos FROM bpos)
              THEN 1 ELSE 0 END AS bloom_pass,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM keys)
              THEN 1 ELSE 0 END AS is_member
  FROM probe)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(bloom_pass) AS BIGINT) AS n_candidates,
       CAST(SUM(is_member) AS BIGINT) AS n_true,
       CAST(SUM(bloom_pass) - SUM(is_member) AS BIGINT) AS n_false_pos,
       ROUND(CAST(SUM(bloom_pass) - SUM(is_member) AS DOUBLE)
             / (COUNT(*) - SUM(is_member)), 6) AS fp_rate
FROM flags
"""


@query("sketch_bloom_semijoin", BLOOM_SQL)
def sketch_bloom_semijoin(spark, sf_dir):
    """Bloom-filter semi-join pre-filter: a {BLOOM_BITS}-bit /
    {BLOOM_K}-hash filter built from the '{BLOOM_SEGMENT}'-segment
    customer keys, probed by every order.  Reports candidate count,
    exact member count, and the measured false-positive rate — a
    Bloom filter never misses (every true member passes, verified:
    n_candidates >= n_true), it only over-admits at the fp rate.

    This is runtime filter pushdown built explicitly: at 100 TB the
    fact side streams map-only against a broadcast SET of <=
    {BLOOM_BITS} bit positions (KBs — bounded by the filter size
    BY CONSTRUCTION, unlike broadcasting the dim keys themselves,
    which grows with the dim table), dropping ~all non-matching rows
    before the real join's shuffle.  The exact membership column
    uses the small dim side directly (broadcast semi-join) so the
    sketch's error is itself hash-verified.

    Determinism: bit positions are md5 slices; the filter is a SET
    of positions (dedup via DISTINCT/UNION — idempotent, order-free);
    pass/fail is 3 set-membership tests.

    Bits are corpus-adaptive (bloom_params over the footer dim row
    count; knee in ORACLE_SCALE_KNEES) so the fp rate holds at any
    scale instead of saturating."""
    from ..io import parquet_row_count

    bits = bloom_params(parquet_row_count(
        os.path.join(sf_dir, "customer.parquet")))
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    keys = (cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
            .select("c_custkey"))

    def pos_of(i, col):
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"bl{i}:"), col.cast("string"))),
            1, 14), 16, 10).cast("bigint") % bits)

    bpos = (keys.select(F.explode(F.array(*[
        pos_of(i, F.col("c_custkey")) for i in range(BLOOM_K)]))
        .alias("pos")).distinct())
    probe = orders.select(
        "o_orderkey", "o_custkey",
        *[pos_of(i, F.col("o_custkey")).alias(f"p{i}")
          for i in range(BLOOM_K)])
    # one broadcast of the bounded position set, probed K times
    # (left-semi per probe column keeps it map-only on the fact side)
    passed = probe
    for i in range(BLOOM_K):
        hit = bpos.select(F.col("pos").alias(f"hit{i}"))
        passed = (passed.join(
            F.broadcast(hit),
            F.col(f"p{i}") == F.col(f"hit{i}"), "left")
            .withColumn(f"ok{i}",
                        F.col(f"hit{i}").isNotNull().cast("int"))
            .drop(f"hit{i}"))
    # the exact-membership side scales with the dim table, so it is
    # deliberately UNHINTED (the planner broadcasts it at test scale
    # from size stats; at 100 TB it becomes a shuffle join — the
    # bloom filter above is the part that stays broadcastable)
    member = keys.select(F.col("c_custkey").alias("o_custkey"),
                         F.lit(1).alias("is_member"))
    flags = (passed.join(member, "o_custkey", "left")
             .select(
                 (F.col("ok0") * F.col("ok1") * F.col("ok2"))
                 .alias("bloom_pass"),
                 F.coalesce(F.col("is_member"), F.lit(0))
                 .alias("is_member")))
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("bloom_pass").cast("bigint").alias("n_candidates"),
        F.sum("is_member").cast("bigint").alias("n_true"),
        (F.sum("bloom_pass") - F.sum("is_member")).cast("bigint")
        .alias("n_false_pos"),
        F.round((F.sum("bloom_pass") - F.sum("is_member"))
                .cast("double")
                / (F.count(F.lit(1)) - F.sum("is_member")), 6)
        .alias("fp_rate"))


# ----------------------------- oracle validity knees (see queries/
# __init__.py ORACLE_SCALE_KNEES): the corpus statistic past which
# each adaptive sizing knob leaves its test-scale value, i.e. the
# last corpus at which the static SQL oracle still matches the Spark
# plan bit-for-bit.  sketch_kmv_distinct has NO knee on purpose: the
# KMV estimator's error 1/sqrt(k-2) is independent of corpus size
# and the k kept values cannot saturate, so the fixed k is the right
# size at every scale.
register_oracle_knee("sketch_hll_distinct", HLL_KNEE_ROWS,
                     table="orders")
register_oracle_knee("sketch_countmin_heavy_hitters",
                     CM_KNEE_TEXT_BYTES, table="documents",
                     column="text")
register_oracle_knee("sketch_bloom_semijoin", BLOOM_KNEE_ROWS,
                     table="customer")

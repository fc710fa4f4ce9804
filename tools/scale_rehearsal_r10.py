"""Round-10 crossover rehearsal (VERDICT r09 "next round" #1/#2):

1. x10 crossover rows for the ~14 sub-second floor-cluster entries
   whose >2x floor-adjusted headline ratios were so far adjudicated
   only by floor-subtraction prose — one measured (spark_s, duck_s,
   ratio) row each at sf0.1 AND x10, interleaved S,D, min of 3.
2. x100 rows for the four entries that crossed at x10 in SCALE_r09
   (ann_lsh, classifier, tfidf_pairs, hybrid_rrf) to close the trend
   question.
3. The bucketed star-join layout A/B for core_cte_chain_fastsum
   (lineitem+orders bucketed+sorted by orderkey, pre-agg star join
   reading co-located buckets) at sf0.1/x10/x100 — the one remaining
   weak entry's clear-or-close experiment.
4. The hybrid lexical leg (tfidf_query_cosine) standalone at
   sf0.1/x10 — the leg-level crossover row VERDICT #4 asks for.

Scaled corpora: /tmp/scale_r09/{x10,x100} (tools/make_scale_tpch.py +
make_scale_data.py, reused from round 9; regenerate if absent).

Usage: python tools/scale_rehearsal_r10.py [out.json] [section...]
  sections: floor x100 bucket lexleg (default: all)
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

#: the sub-second floor cluster (r09 verdict "what's missing" #1 +
#: the two floor-dominated nits) — every headline entry whose fa>2
#: adjudication was prose-only.
FLOOR_TARGETS = [
    "dedup_exact",
    "core_insert_if_absent",
    "ext_range_join_binned",
    "ext_asof_join",
    "sessionization_batch",
    "core_dim_time",
    "gold_events_full",
    "core_moving_avg_partitioned",
    "sims_cosine_topk_bruteforce",
    "stream_tumbling_window",
    "mm_binary_metadata",
    "text_quality_score",
    "core_groupby_agg_fastsum",
    "dedup_embedding_cosine",
]

#: crossed at x10 in SCALE_r09 — close the trend with one x100 row —
#: plus the five floor-cluster entries that did NOT cross at x10 in
#: this round's sweep (their duck side is cheap at any scale, so the
#: x100 row is affordable and settles the trend either way).
X100_TARGETS = [
    "sims_ann_lsh_bucketed",
    "curation_quality_classifier",
    "text_tfidf_cosine_pairs",
    "sims_hybrid_rrf",
    "dedup_exact",
    "core_insert_if_absent",
    "ext_range_join_binned",
    "stream_tumbling_window",
    "core_groupby_agg_fastsum",
]

POINTS = {
    "sf0.1": "/root/testdata/sf0.1",
    "x10": "/tmp/scale_r09/x10",
    "x100": "/tmp/scale_r09/x100",
}
N = 3
N_X100 = 2
DUCK_CAP_S = 600.0
NB = 16  # buckets for the layout A/B


def _measure_pair(spark, cons, reg, name, sf_dir, n_runs):
    srs, drs, errs = [], [], []
    spark_dead = duck_dead = False
    for _ in range(n_runs):
        if not spark_dead:
            t0 = time.perf_counter()
            try:
                reg[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                srs.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:
                errs.append(f"spark: {type(exc).__name__}: {exc}"[:200])
                spark_dead = True
            finally:
                spark.catalog.clearCache()
        if duck_dead or (drs and min(drs) > DUCK_CAP_S):
            continue
        t0 = time.perf_counter()
        try:
            cons.execute(reg[name].oracle).fetchall()
            drs.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:
            errs.append(f"duck: {type(exc).__name__}: {exc}"[:200])
            duck_dead = True
    err = "; ".join(errs) or None
    return {
        "spark_runs": srs, "duck_runs": drs,
        "spark_s": min(srs) if srs else None,
        "duck_s": min(drs) if drs else None,
        "ratio": (round(min(srs) / min(drs), 2) if srs and drs
                  else None),
        **({"err": err} if err else {}),
    }


def _bucketed_fastsum(spark, li_name, ord_name, cust, nation):
    from pyspark.sql import functions as F

    li = spark.table(li_name)
    orders = spark.table(ord_name)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_po = li.groupBy("l_orderkey").agg(
        F.sum(F.floor(disc * 10000 + 0.5).cast("long")).alias("rev_o"))
    daily = (rev_po.join(orders, rev_po.l_orderkey == orders.o_orderkey)
             .join(cust, orders.o_custkey == cust.c_custkey)
             .join(F.broadcast(nation),
                   cust.c_nationkey == nation.n_nationkey)
             .groupBy("n_name", F.to_date("o_orderdate")
                      .alias("order_day"))
             .agg(F.sum("rev_o").alias("rev_s")))
    return (daily.groupBy("n_name", F.trunc("order_day", "month")
                          .alias("order_month"))
            .agg(F.round(F.sum("rev_s").cast("double") / 10000, 6)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_days")))


def bucket_ab(spark, reg, sf_dir, label) -> dict:
    """A/B the pre-agg star join over a bucketed-by-orderkey
    lineitem+orders layout vs the plain parquet plan, same session,
    interleaved, min of 3.  The one-time layout write is reported
    separately (it is the warehouse-build cost a real deployment
    amortizes over every downstream star query)."""
    from pyspark.sql import functions as F  # noqa: F401

    from energi_data_pipeline_spark.io import read_table

    safe = label.replace(".", "_")
    li_name = f"li_bkt_{safe}"
    ord_name = f"ord_bkt_{safe}"
    t0 = time.perf_counter()
    (read_table(spark, sf_dir, "lineitem")
     .select("l_orderkey", "l_extendedprice", "l_discount")
     .write.bucketBy(NB, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable(li_name))
    (read_table(spark, sf_dir, "orders")
     .select("o_orderkey", "o_custkey", "o_orderdate")
     .write.bucketBy(NB, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable(ord_name))
    layout_write_s = round(time.perf_counter() - t0, 3)
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    bkt, base = [], []
    try:
        for _ in range(N):
            t0 = time.perf_counter()
            _bucketed_fastsum(spark, li_name, ord_name, cust, nation) \
                .write.format("noop").mode("overwrite").save()
            bkt.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            reg["core_cte_chain_fastsum"].fn(spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            base.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        same = (sorted(map(tuple, _bucketed_fastsum(
                    spark, li_name, ord_name, cust, nation).collect()))
                == sorted(map(tuple, reg["core_cte_chain_fastsum"]
                              .fn(spark, sf_dir).collect())))
    finally:
        for n in (li_name, ord_name):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
    return {
        "layout_write_s": layout_write_s,
        "bucketed_runs": bkt, "baseline_runs": base,
        "bucketed_s": min(bkt), "baseline_s": min(base),
        "values_equal": same,
    }


def lexleg(spark, sf_dir) -> dict:
    """Standalone lexical leg (tfidf_query_cosine at the hybrid
    stride), min of 3, caches dropped — the leg-level scale row."""
    from energi_data_pipeline_spark.queries.simsearch import (
        QUERY_STRIDE)
    from energi_data_pipeline_spark.queries.text import (
        tfidf_query_cosine)

    rs = []
    for _ in range(N):
        t0 = time.perf_counter()
        tfidf_query_cosine(spark, sf_dir, QUERY_STRIDE) \
            .write.format("noop").mode("overwrite").save()
        rs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return {"spark_runs": rs, "spark_s": min(rs)}


def main() -> None:
    args = list(sys.argv[1:])
    out_path = args[0] if args and args[0].endswith(".json") \
        else "/tmp/scale_r10/rehearsal.json"
    sections = [a for a in args if not a.endswith(".json")] \
        or ["floor", "x100", "bucket", "lexleg"]
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    from parity import duck_connection

    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark

    reg = load_all()
    spark = get_spark("energi-scale-r10")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for n in set(FLOOR_TARGETS + X100_TARGETS):
        try:
            reg[n].fn(spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    result: dict = {"metric": "crossover_rehearsal_r10",
                    "sections": {}}

    def _flush():
        # checkpoint after every section: a crash in a later section
        # must not lose an hour of measured rows (the first r10 run
        # lost the floor sweep to a bucket-table name bug)
        Path(out_path).write_text(
            json.dumps(result, indent=1) + "\n", encoding="utf-8")

    if "floor" in sections:
        sec: dict = {}
        for label in ("sf0.1", "x10"):
            cons = duck_connection(POINTS[label])
            rows = {}
            for n in FLOOR_TARGETS:
                rows[n] = _measure_pair(spark, cons, reg, n,
                                        POINTS[label], N)
                print(f"# floor {label} {n}: {rows[n]['spark_runs']} "
                      f"vs {rows[n]['duck_runs']}",
                      file=sys.stderr, flush=True)
            cons.close()
            sec[label] = rows
        result["sections"]["floor_cluster"] = sec
        _flush()

    if "x100" in sections:
        cons = duck_connection(POINTS["x100"])
        rows = {}
        for n in X100_TARGETS:
            rows[n] = _measure_pair(spark, cons, reg, n,
                                    POINTS["x100"], N_X100)
            print(f"# x100 {n}: {rows[n]['spark_runs']} vs "
                  f"{rows[n]['duck_runs']}", file=sys.stderr,
                  flush=True)
        cons.close()
        result["sections"]["x100_trend"] = rows
        _flush()

    if "bucket" in sections:
        rows = {}
        for label in ("sf0.1", "x10", "x100"):
            rows[label] = bucket_ab(spark, reg, POINTS[label], label)
            print(f"# bucket {label}: {rows[label]}",
                  file=sys.stderr, flush=True)
        result["sections"]["bucketed_star_ab"] = rows
        _flush()

    if "lexleg" in sections:
        rows = {}
        for label in ("sf0.1", "x10"):
            rows[label] = lexleg(spark, POINTS[label])
            print(f"# lexleg {label}: {rows[label]}",
                  file=sys.stderr, flush=True)
        result["sections"]["hybrid_lex_leg"] = rows
        _flush()

    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    payload = json.dumps(result, indent=1)
    Path(out_path).write_text(payload + "\n", encoding="utf-8")
    print(payload, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()

"""Round-9 stage profiler: where the wall goes in the four
verdict-flagged entries (classifier, ann_lsh_bucketed,
cte_chain_fastsum, tfidf/hybrid) at sf0.1.

Each probe times a SUB-PLAN of the real query through the noop sink
(min of N runs, caches dropped between full-query runs but NOT
between a materialize-then-consume pair, which is the point of that
probe).  Output: one human-readable line per probe.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = 3


def timed(label, mk, spark, n=N, keep_cache=False):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if not keep_cache:
            spark.catalog.clearCache()
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return best


def main():
    from pyspark.sql import functions as F

    from energi_data_pipeline_spark.queries import load_all
    from energi_data_pipeline_spark.session import get_spark

    spark = get_spark("energi-profile")
    reg = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    which = set(sys.argv[2:]) or {"classifier", "ann", "cte", "tfidf"}

    if "classifier" in which:
        from energi_data_pipeline_spark.queries.curation import (
            _dense_features)

        # warm
        timed("[clf] full classifier (warm1)",
              lambda: reg["curation_quality_classifier"].fn(spark, SF),
              spark, n=1)
        timed("[clf] full classifier steady",
              lambda: reg["curation_quality_classifier"].fn(spark, SF),
              spark)
        timed("[clf] _dense_features materialize only",
              lambda: _dense_features(spark, SF), spark)
        # iterations-only: materialize features, keep cache, run full
        _dense_features(spark, SF).write.format("noop") \
            .mode("overwrite").save()
        timed("[clf] classifier with features ALREADY persisted",
              lambda: reg["curation_quality_classifier"].fn(spark, SF),
              spark, keep_cache=True)
        spark.catalog.clearCache()

    if "ann" in which:
        from energi_data_pipeline_spark.queries.simsearch import (
            QUERY_STRIDE, TOP_K, _bucket_col, _norm, corpus_size,
            planes_for, spread, t)

        timed("[ann] full sims_ann_lsh_bucketed (warm1)",
              lambda: reg["sims_ann_lsh_bucketed"].fn(spark, SF),
              spark, n=1)
        timed("[ann] full sims_ann_lsh_bucketed steady",
              lambda: reg["sims_ann_lsh_bucketed"].fn(spark, SF),
              spark)

        def vec():
            emb = spread(t(spark, SF, "embeddings"))
            return emb.select(
                "vec_id", "embedding",
                _norm(F.col("embedding")).alias("nrm"),
                _bucket_col(planes_for(corpus_size(SF)))
                .alias("bucket"))

        timed("[ann] vec projection (norm+bucket) only",
              lambda: vec(), spark)
        timed("[ann] scan+spread only",
              lambda: spread(t(spark, SF, "embeddings")), spark)

        def pairs_nownd():
            v = vec()
            q = v.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
                F.col("nrm").alias("q_nrm"),
                F.col("bucket").alias("q_bucket"),
            ).filter(F.col("query_id") % QUERY_STRIDE == 0)
            from energi_data_pipeline_spark.queries.simsearch import _dot
            return (q.join(v, (F.col("bucket") == F.col("q_bucket"))
                           & (F.col("vec_id") != F.col("query_id")))
                    .select("query_id",
                            F.col("vec_id").alias("neighbor_id"),
                            "bucket",
                            F.round(_dot(F.col("q_emb"),
                                         F.col("embedding"))
                                    / (F.col("q_nrm") * F.col("nrm")),
                                    6).alias("cosine")))

        timed("[ann] pairs join, no window", pairs_nownd, spark)

    if "cte" in which:
        from energi_data_pipeline_spark.queries.core import t as ct

        timed("[cte] full core_cte_chain_fastsum (warm1)",
              lambda: reg["core_cte_chain_fastsum"].fn(spark, SF),
              spark, n=1)
        timed("[cte] full core_cte_chain_fastsum steady",
              lambda: reg["core_cte_chain_fastsum"].fn(spark, SF),
              spark)

        def joins_only():
            li = ct(spark, SF, "lineitem")
            orders = ct(spark, SF, "orders")
            cust = ct(spark, SF, "customer")
            nation = ct(spark, SF, "nation")
            disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
            return (li.join(orders, li.l_orderkey == orders.o_orderkey)
                    .join(cust, orders.o_custkey == cust.c_custkey)
                    .join(F.broadcast(nation),
                          cust.c_nationkey == nation.n_nationkey)
                    .select("n_name", "o_orderdate",
                            F.floor(disc * 10000 + 0.5).cast("long")
                            .alias("r")))

        timed("[cte] star joins only (no agg)", joins_only, spark)

        def daily_only():
            li = ct(spark, SF, "lineitem")
            orders = ct(spark, SF, "orders")
            cust = ct(spark, SF, "customer")
            nation = ct(spark, SF, "nation")
            disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
            return (li.join(orders, li.l_orderkey == orders.o_orderkey)
                    .join(cust, orders.o_custkey == cust.c_custkey)
                    .join(F.broadcast(nation),
                          cust.c_nationkey == nation.n_nationkey)
                    .groupBy("n_name",
                             F.to_date("o_orderdate").alias("order_day"))
                    .agg(F.sum(F.floor(disc * 10000 + 0.5).cast("long"))
                         .alias("rev_s")))

        timed("[cte] daily agg (1st grain) only", daily_only, spark)

        def li_orders_only():
            li = ct(spark, SF, "lineitem")
            orders = ct(spark, SF, "orders")
            return li.join(orders, li.l_orderkey == orders.o_orderkey) \
                .select("l_extendedprice", "o_orderdate")

        timed("[cte] lineitem x orders join only", li_orders_only, spark)
        timed("[cte] lineitem scan only",
              lambda: ct(spark, SF, "lineitem").select(
                  "l_orderkey", "l_extendedprice", "l_discount"),
              spark)

    if "tfidf" in which:
        from energi_data_pipeline_spark.queries.text import _tfidf_w

        timed("[tfidf] full text_tfidf_cosine_pairs (warm1)",
              lambda: reg["text_tfidf_cosine_pairs"].fn(spark, SF),
              spark, n=1)
        timed("[tfidf] full text_tfidf_cosine_pairs steady",
              lambda: reg["text_tfidf_cosine_pairs"].fn(spark, SF),
              spark)
        timed("[tfidf] _tfidf_w materialize only",
              lambda: _tfidf_w(spark, SF), spark)
        _tfidf_w(spark, SF).write.format("noop") \
            .mode("overwrite").save()
        timed("[tfidf] pairs with w ALREADY persisted",
              lambda: reg["text_tfidf_cosine_pairs"].fn(spark, SF),
              spark, keep_cache=True)
        timed("[tfidf] hybrid_rrf with w ALREADY persisted",
              lambda: reg["sims_hybrid_rrf"].fn(spark, SF),
              spark, keep_cache=True)
        spark.catalog.clearCache()
        timed("[tfidf] full sims_hybrid_rrf steady",
              lambda: reg["sims_hybrid_rrf"].fn(spark, SF), spark)

    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


if __name__ == "__main__":
    main()

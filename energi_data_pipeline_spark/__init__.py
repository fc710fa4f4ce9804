"""energi_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first reimplementation of the query and
data-processing capabilities of ``a-holm/energi-data-pipeline``
(reference at /root/reference, studied for *semantics only*):

* medallion (bronze -> silver -> gold) incremental ETL
  (reference: pipelines/{bronze_ingest,silver_transform,gold_aggr}.py)
* star-schema time-series modelling (dim_time + fact tables)
* watermark-driven incremental processing with window warm-up
* 5-row trailing moving averages / volatility (window functions)
* idempotent insert-if-absent writes
* ordered CSV / parquet export

plus the LLM-training-data extension operators this engine adds as
first-class citizens: exact & fuzzy deduplication (MinHash-LSH,
SimHash, n-gram Jaccard), embedding similarity search (brute-force
and LSH-bucketed ANN), text analysis (language id, quality scoring,
token stats, fingerprinting) and multimodal binary-column plumbing.

Everything is expressed with the DataFrame / Spark SQL API so that
Catalyst + Tungsten (predicate pushdown, column pruning, broadcast
selection, whole-stage codegen, AQE) carry the physical execution;
no RDDs, no driver-side loops over data.
"""

__version__ = "0.1.0"

"""Structured Streaming parity query.

The reference pipeline *is* a micro-batch stream (SURVEY.md §2,
"streaming reading"): bronze = offset-tracked source, silver =
stateless incremental transform, gold = sliding window with warm-up.
``energi_data_pipeline_spark.streaming`` holds the foreachBatch
medallion; this query demonstrates the native streaming operator —
a tumbling-window aggregation executed by the Structured Streaming
engine (Trigger.AvailableNow over the events parquet) whose result
is still deterministic, so it gets a full DuckDB oracle.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from ..session import tune
from . import query

STREAM_SQL = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
       event_type,
       ROUND(AVG(value), 6) AS avg_value,
       COUNT(*) AS n_events
FROM events
GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
"""


@query("stream_tumbling_window", STREAM_SQL)
def stream_tumbling_window(spark, sf_dir):
    """5-minute tumbling-window avg per event_type, run as a real
    Structured Streaming query (readStream -> window agg -> memory
    sink, Trigger.AvailableNow).  Epoch-aligned windows match
    DuckDB's time_bucket.  At scale the same plan runs unbounded
    with ``withWatermark`` bounding the state store."""
    tune(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema  # ts is int64 nanos
    sink = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    agged = (
        # file stream sources take a directory + glob, not a file
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"),
             F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("bucket_start"), "event_type",
                "avg_value", "n_events")
    )
    q = (agged.writeStream.format("memory").queryName(sink)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(sink)

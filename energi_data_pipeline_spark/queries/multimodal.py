"""Multimodal binary-column plumbing.

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata (BASELINE.json north star).  The decode
libraries aren't in this container, so the *decode* step is a
clearly-marked deterministic stub — but the Spark-side plumbing
(binary columns, metadata extraction, Arrow-batched mapInPandas
feature extraction with an explicit output schema) is real and
oracle- or shape-tested.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from .core import t


@query(
    "mm_binary_metadata",
    """SELECT doc_id,
              octet_length(encode(text)) AS n_bytes,
              sha256(text) AS content_sha256,
              lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
       FROM documents""",
)
def mm_binary_metadata(spark, sf_dir):
    """Opaque-blob metadata: byte length, content digest, leading
    "magic bytes" — the format-sniffing layer of a multimodal
    pipeline, all JVM-side over a binary column."""
    d = t(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha256"),
        F.lower(F.hex(F.encode(F.substring(F.col("text"), 1, 4),
                               "UTF-8"))).alias("magic_hex"),
    )


@query("mm_decode_features", None)  # mapInPandas -> rows-only check
def mm_decode_features(spark, sf_dir):
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: the real 100 TB shape for image/audio decode
    (vectorized batches, explicit output schema, no row-at-a-time
    Python).  The decoder itself is a deterministic STUB (container
    has no image/audio libs) — see operators.multimodal."""
    from ..operators.multimodal import extract_features

    d = t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return extract_features(payloads)

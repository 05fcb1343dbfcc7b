"""Minimal stdlib PNG codec (zlib + struct) — no Pillow in the image.

Encodes RGBA8 (color type 6) and 16-bit grayscale (color type 0) losslessly;
the decoder handles exactly what the encoder emits (filter 0) for roundtrip
tests.  Replaces geotrellis renderPng (Render.scala:86,90,96); lossless, so
golden hashes are stable across platforms.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_rgba(arr: np.ndarray) -> bytes:
    """(h, w, 4) uint8 -> PNG bytes."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 4
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 4)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def encode_gray16(arr: np.ndarray) -> bytes:
    """(h, w) uint16 -> 16-bit grayscale PNG bytes (big-endian samples)."""
    assert arr.dtype == np.uint16 and arr.ndim == 2
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    be = arr.astype(">u2").view(np.uint8).reshape(h, w * 2)
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), be], axis=1).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode(data: bytes) -> np.ndarray:
    """Decode PNGs produced by this module (filter 0 rows only).

    Returns (h, w, 4) uint8 for RGBA or (h, w) uint16 for gray16.
    """
    assert data[:8] == _SIG, "not a PNG"
    pos = 8
    ihdr = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    w, h, depth, ctype = ihdr[0], ihdr[1], ihdr[2], ihdr[3]
    raw = zlib.decompress(idat)
    if ctype == 6 and depth == 8:
        stride = w * 4 + 1
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        assert (rows[:, 0] == 0).all(), "only filter 0 supported"
        return rows[:, 1:].reshape(h, w, 4).copy()
    if ctype == 0 and depth == 16:
        stride = w * 2 + 1
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        assert (rows[:, 0] == 0).all(), "only filter 0 supported"
        return rows[:, 1:].copy().view(">u2").astype(np.uint16).reshape(h, w)
    raise ValueError(f"unsupported PNG layout ctype={ctype} depth={depth}")

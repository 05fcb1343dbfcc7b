"""Morton (Z-order) cell index over ZXY tiles, with an H3/S2-style API.

The reference indexes stored tiles with a Z-order SFC over (col,row,time) at
1-day temporal resolution (conf/output.json:15-18).  We keep the same curve
as an explicit ``cell_key`` BIGINT column so Catalyst/Parquet min-max pruning
plays the role GeoTrellis's SFC range reads play
(server/src/main/scala/demo/TileReader.scala:12-14, Router.scala:85).

Layout of the 64-bit key (non-negative for zoom <= 28):
    bits 58..63 : zoom (6 bits)
    bits  0..57 : Morton interleave of (col, row), 29 bits each

API mirrors h3-py so a real H3/S2 lib is a drop-in swap:
``cell(lat, lng, res)``, ``k_ring(cell, k)``, ``cell_to_parent(cell)``.
All functions vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

from . import tiling
from .geom import lnglat_to_mercator

_ZOOM_SHIFT = 58
_MORTON_MASK = (1 << 58) - 1


_U = np.uint64


def _part1by1(v):
    """Spread the low 29 bits of v so there is a 0 bit between each."""
    v = np.asarray(v).astype("u8") & _U(0x1FFFFFFF)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def _compact1by1(v):
    v = np.asarray(v).astype("u8") & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def morton(col, row):
    """Z-order interleave: x bits even, y bits odd."""
    return _part1by1(col) | (_part1by1(row) << np.uint64(1))


def cell_key(zoom, col, row):
    """(zoom, col, row) -> signed int64 cell key."""
    z = np.asarray(zoom).astype("u8") << _U(_ZOOM_SHIFT)
    return (z | morton(col, row)).astype("i8")


def cell_decode(key):
    """cell key -> (zoom, col, row)."""
    k = np.asarray(key).astype("u8")
    zoom = (k >> _U(_ZOOM_SHIFT)).astype("i8")
    m = k & _U(_MORTON_MASK)
    col = _compact1by1(m).astype("i8")
    row = _compact1by1(m >> _U(1)).astype("i8")
    return zoom, col, row


def cell(lat, lng, res):
    """H3-style: geographic point -> containing cell at resolution ``res``
    (= ZXY zoom)."""
    mx, my = lnglat_to_mercator(lng, lat)
    col, row = tiling.map_to_tile(mx, my, res)
    return cell_key(res, col, row)


def cell_to_parent(key):
    zoom, col, row = cell_decode(key)
    return cell_key(zoom - 1, col // 2, row // 2)


def cell_to_children(key):
    zoom, col, row = cell_decode(key)
    zoom, col, row = int(zoom), int(col), int(row)
    return [
        cell_key(zoom + 1, 2 * col + dx, 2 * row + dy)
        for dy in (0, 1)
        for dx in (0, 1)
    ]


def k_ring(key, k):
    """All cells within Chebyshev distance k of ``key`` (grid square ring),
    clipped to the world. Powers the kNN candidate expansion (SURVEY §2.3)."""
    zoom, col, row = cell_decode(key)
    zoom, col, row = int(zoom), int(col), int(row)
    n = 1 << zoom
    c0, c1 = max(0, col - k), min(n - 1, col + k)
    r0, r1 = max(0, row - k), min(n - 1, row + k)
    cols, rows = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
    return cell_key(zoom, cols.ravel(), rows.ravel())


def ring_only(key, k):
    """Cells at exactly Chebyshev distance k (the ring shell)."""
    if k == 0:
        return np.asarray([key], dtype="i8")
    inner = set(k_ring(key, k - 1).tolist())
    outer = k_ring(key, k)
    return np.asarray([c for c in outer.tolist() if c not in inner], dtype="i8")


def cover_extent(zoom, xmin, ymin, xmax, ymax):
    """All cell keys whose tile extent intersects the mercator extent.

    The driver-side key-cover enumeration that replaces GeoTrellis's
    Intersects(extent) -> SFC ranges (Router.scala:85,148-149)."""
    c0, r0, c1, r1 = tiling.extent_to_tile_range(xmin, ymin, xmax, ymax, zoom)
    cols, rows = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
    return cell_key(zoom, cols.ravel(), rows.ravel())


def day_bucket(ts_millis, resolution_ms=86_400_000):
    """Temporal component of the reference's zorder index: epoch millis ->
    day bucket (conf/output.json:17 temporalResolution=86400000)."""
    return np.asarray(ts_millis, dtype="i8") // np.int64(resolution_ms)

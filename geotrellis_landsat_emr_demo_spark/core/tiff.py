"""Pure-numpy baseline TIFF / GeoTIFF codec — no libtiff/GDAL/PIL.

The reference demo's actual scene payload container is GeoTIFF: the
landsat-util fetch in ``ingest/src/main/scala/demo/etl/landsat/
LandsatInput.scala:24`` (``getRasterFromS3`` / ``getFromGoogle``) hands
GeoTrellis a GeoTIFF per band, which GeoTrellis's own reader decodes.
This module is the engine's built-in equivalent, sized like the baseline
JPEG codec (core.jpeg): enough of TIFF 6.0 + the GeoTIFF extension to
read real uncompressed / deflate / LZW / PackBits / JPEG-in-TIFF
(TechNote 2, 8- AND 12-bit, chunky or planar) Landsat-style rasters out
of the box, with the honest ``NotImplementedError`` seam for anything
else a user can cover via
:func:`operators.multimodal.register_decoder`.

Coverage:

- both byte orders (``II`` little / ``MM`` big), classic TIFF magic 42
  AND BigTIFF magic 43 (8-byte offsets/counts, LONG8/SLONG8/IFD8 types —
  the layout files past 4 GiB require)
- grayscale and RGB chunky interleave (SamplesPerPixel 1 or 3)
- 8/16-bit unsigned, 16/32-bit signed, 32-bit float samples
- striped AND tiled layouts (StripOffsets/RowsPerStrip, TileWidth/...)
- Compression 1 (none), 8 / 32946 (zlib deflate), 5 (LZW, TIFF 6.0 §13
  early-change variable-width codes), 32773 (PackBits)
- Predictor 2 (horizontal differencing; undone with a wrapping cumsum)
- GeoTIFF georeferencing surfaced in :func:`read` metadata:
  ModelPixelScale (33550), ModelTiepoint (33922), GeoKeyDirectory
  (34735) inline SHORT keys (model type, raster type, EPSG codes)

Encoder (fixture/writer side): little-endian, striped or tiled,
none/deflate/PackBits, optional predictor 2, optional GeoTIFF tags —
enough to roundtrip every decoder path and to write valid GeoTIFF tiles
other tools read.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF field types -> (struct letter, byte size)
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("s", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL (2x LONG)
    6: ("b", 1),   # SBYTE
    7: ("B", 1),   # UNDEFINED (opaque bytes, e.g. JPEGTables)
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
    16: ("Q", 8),  # LONG8 (BigTIFF)
    17: ("q", 8),  # SLONG8 (BigTIFF)
    18: ("Q", 8),  # IFD8 (BigTIFF)
}

_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFFSETS, _T_TILE_COUNTS = 322, 323, 324, 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE, _T_TIEPOINT, _T_GEOKEYS = 33550, 33922, 34735

_COMP_NONE, _COMP_DEFLATE_ADOBE, _COMP_PACKBITS, _COMP_DEFLATE = 1, 8, 32773, 32946
_COMP_LZW = 5
_COMP_JPEG = 7  # "new-style" JPEG-in-TIFF (TIFF TechNote 2)
_T_JPEG_TABLES = 347


# ---------------------------------------------------------------- decoder --


def _read_ifd(data: bytes, bo: str, off: int, big: bool = False) -> dict:
    """IFD at ``off`` -> {tag: numpy array of values} (+ next-IFD offset
    under key -1).  ``big``: BigTIFF layout (8-byte count/offsets, 20-byte
    entries, inline values up to 8 bytes — TIFF supplement "BigTIFF")."""
    if big:
        hdr_w, ent_w, inline, cnt_fmt, off_fmt = 8, 20, 8, "HHQ", "Q"
    else:
        hdr_w, ent_w, inline, cnt_fmt, off_fmt = 2, 12, 4, "HHI", "I"
    (n,) = struct.unpack_from(bo + ("Q" if big else "H"), data, off)
    n = int(n)
    out: dict = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + cnt_fmt, data, off + hdr_w + ent_w * i)
        if typ not in _TYPES:
            continue  # unknown type: skip per TIFF 6.0 guidance
        letter, size = _TYPES[typ]
        cnt = int(cnt)
        # _TYPES size is the FULL element size (RATIONAL's 8 covers both
        # LONGs) — an extra ×2 here made a count-1 BigTIFF RATIONAL (8
        # bytes, legitimately inline) look external and dereferenced its
        # value as an offset.
        nbytes = size * cnt
        voff = off + hdr_w + ent_w * i + (ent_w - inline)
        if nbytes > inline:
            (voff,) = struct.unpack_from(bo + off_fmt, data, voff)
            voff = int(voff)
        if typ == 2:
            out[tag] = data[voff : voff + cnt].split(b"\0", 1)[0].decode(
                "ascii", "replace"
            )
            continue
        if typ == 5:
            raw = struct.unpack_from(bo + "II" * cnt, data, voff)
            out[tag] = np.asarray(
                [raw[2 * j] / max(1, raw[2 * j + 1]) for j in range(cnt)]
            )
            continue
        out[tag] = np.asarray(struct.unpack_from(bo + letter * cnt, data, voff))
    (nxt,) = struct.unpack_from(bo + off_fmt, data, off + hdr_w + ent_w * n)
    out[-1] = int(nxt)
    return out


def _jpeg_splice_tables(tables: bytes, block: bytes) -> bytes:
    """TIFF TechNote 2 JPEGTables: a tables-only abbreviated stream
    (SOI..DQT/DHT..EOI) shared by every block whose own stream omits the
    tables.  Splice = tables without its EOI + block without its SOI, so
    the decoder sees one well-formed stream."""
    if not tables:
        return block
    t = tables[:-2] if tables[-2:] == b"\xff\xd9" else tables
    b = block[2:] if block[:2] == b"\xff\xd8" else block
    return t + b


def _jpeg_block(
    raw: bytes, tables: bytes | None, bw: int, bh: int, spp: int
) -> np.ndarray:
    """Decode one JPEG-compressed block -> (bh, bw, spp) uint8 (padded /
    cropped to the block grid; the writer pads tiles, foreign files may
    encode exact edge dims)."""
    from . import jpeg

    arr = jpeg.decode(_jpeg_splice_tables(tables or b"", raw))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] != spp:
        raise ValueError(
            f"JPEG block has {arr.shape[2]} samples, IFD says {spp}"
        )
    out = np.zeros((bh, bw, spp), dtype=arr.dtype)
    ys, xs = min(bh, arr.shape[0]), min(bw, arr.shape[1])
    out[:ys, :xs] = arr[:ys, :xs]
    return out


def _packbits_decode(src: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expect:
        c = src[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += src[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            out += src[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first variable-width codes (9->12 bits),
    ClearCode 256 / EOI 257, and the spec's early-change convention
    (the code width bumps when the NEXT table entry would be
    2^width - 1, one code earlier than vanilla LZW)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    acc = nbits = 0
    prev = b""
    out = bytearray()
    total_bits = 8 * len(src)
    bits_done = 0
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        bits_done += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == CLEAR:
                table = list(base)
                width = 9
                prev = b""
                continue
            if code == EOI:
                return bytes(out[:expect])
            # Early-change off-by-one at stream end: the encoder's final
            # flush code adds no table entry, so when the decoder's table
            # hits the bump threshold exactly on that last data code the
            # decoder widens but the encoder doesn't — its EOI arrives at
            # the PRE-bump width.  If the decoder is EXACTLY at a
            # just-bumped width (table length still at the bump threshold
            # — any post-bump data code would have grown it), the top
            # width-1 bits spell EOI, and nothing but byte padding can
            # follow (a real EOI would need >= 9 more bits), this IS the
            # end of the stream.  The table-length clause keeps ordinary
            # final data codes (514/515 at a non-threshold state, in a
            # stream that omits EOI) from matching.
            if (
                (code >> 1) == EOI
                and len(table) == (1 << (width - 1)) - 2
                and (total_bits - bits_done) + nbits + 1 < 8
            ):
                return bytes(out[:expect])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev:
                entry = prev + prev[:1]  # KwKwK case
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            out += entry
            if prev:
                table.append(prev + entry[:1])
                # the decoder's table trails the encoder's by one entry,
                # so the early-change bump fires one entry sooner here
                if len(table) >= (1 << width) - 2 and width < 12:
                    width += 1
            prev = entry
            if len(out) >= expect:
                return bytes(out[:expect])
        acc &= (1 << width) - 1  # keep the accumulator bounded
    return bytes(out[:expect])


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF 6.0 §13 LZW encoder (mirror of :func:`_lzw_decode`): emits
    ClearCode up front and again when the table fills at 4094 entries."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1 if nbits else 0

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for b in raw:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change: bump width when the next code to be WRITTEN
        # would not fit (table about to reach 2^width - 1)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:  # table full: reset (keeps width <= 12)
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _undo_predictor(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing inverse: wrapping cumsum along columns.
    block shape (rows, cols, spp); integer dtypes only (predictor 2)."""
    wide = np.cumsum(block.astype(np.int64), axis=1)
    return wide.astype(block.dtype)  # mod-2^bits wrap == spec semantics


def read(data: bytes):
    """TIFF bytes -> (array, meta).  array: (h, w) for grayscale, else
    (h, w, spp).  meta: dims/layout plus GeoTIFF georeferencing when the
    tags are present (``pixel_scale``, ``tiepoint``, ``geo_keys``,
    ``epsg`` when derivable)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    big = magic == 43
    if big:
        # BigTIFF header: offset-size (must be 8) + reserved, then Q offset
        osize, _zero = struct.unpack_from(bo + "HH", data, 4)
        if osize != 8:
            raise NotImplementedError(f"BigTIFF offset size {osize}")
        (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
    elif magic != 42:
        raise ValueError(f"not a TIFF (magic {magic})")
    else:
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    ifd = _read_ifd(data, bo, int(ifd_off), big=big)

    w = int(ifd[_T_WIDTH][0])
    h = int(ifd[_T_HEIGHT][0])
    spp = int(ifd.get(_T_SPP, [1])[0])
    bits_arr = ifd.get(_T_BITS, np.asarray([1]))
    if len(set(int(b) for b in bits_arr)) != 1:
        raise NotImplementedError("heterogeneous BitsPerSample")
    bits = int(bits_arr[0])
    comp = int(ifd.get(_T_COMPRESSION, [1])[0])
    fmt = int(ifd.get(_T_SAMPLE_FORMAT, [1])[0])
    pred = int(ifd.get(_T_PREDICTOR, [1])[0])
    planar = int(ifd.get(_T_PLANAR, [1])[0])
    if planar not in (1, 2):
        raise NotImplementedError(f"PlanarConfiguration {planar}")
    if pred not in (1, 2):
        raise NotImplementedError(f"predictor {pred}")
    dt = {
        (8, 1): "u1", (16, 1): "u2", (32, 1): "u4",
        (16, 2): "i2", (32, 2): "i4", (32, 3): "f4", (64, 3): "f8",
    }.get((bits, fmt))
    if comp == _COMP_JPEG and bits == 12 and fmt == 1:
        dt = "u2"  # 12-bit JPEG blocks decode into uint16 samples
    if dt is None:
        raise NotImplementedError(f"bits={bits} sample_format={fmt}")
    if pred == 2 and dt in ("f4", "f8"):
        raise NotImplementedError("predictor 2 on float samples")
    dtype = np.dtype(bo + dt)

    if comp in (_COMP_DEFLATE_ADOBE, _COMP_DEFLATE):
        inflate = lambda b, want: zlib.decompress(b)  # noqa: E731
    elif comp == _COMP_PACKBITS:
        inflate = _packbits_decode
    elif comp == _COMP_LZW:
        inflate = _lzw_decode
    elif comp == _COMP_NONE:
        inflate = lambda b, want: b  # noqa: E731
    elif comp == _COMP_JPEG:
        if bits not in (8, 12):
            raise NotImplementedError(f"JPEG-in-TIFF at {bits} bits")
        inflate = None  # decoded straight to pixels in blocks()
    else:
        raise NotImplementedError(
            f"TIFF compression {comp} (plug a whole-file decoder in "
            "via operators.multimodal.register_decoder)"
        )
    jpeg_tables = (
        bytes(bytearray(int(v) & 0xFF for v in ifd[_T_JPEG_TABLES]))
        if comp == _COMP_JPEG and _T_JPEG_TABLES in ifd
        else None
    )

    def blocks(offsets, counts, bw, bh, bspp=None):
        bspp = spp if bspp is None else bspp
        for off, cnt in zip(offsets, counts):
            raw = bytes(data[int(off) : int(off) + int(cnt)])
            if comp == _COMP_JPEG:
                yield _jpeg_block(raw, jpeg_tables, bw, bh, bspp)
                continue
            want = bw * bh * bspp * dtype.itemsize
            raw = inflate(raw, want)
            arr = np.frombuffer(raw, dtype=dtype, count=min(len(raw) // dtype.itemsize, bw * bh * bspp))
            if arr.size < bw * bh * bspp:  # short final strip: pad
                arr = np.concatenate([arr, np.zeros(bw * bh * bspp - arr.size, dtype)])
            blk = arr.reshape(bh, bw, bspp)
            yield _undo_predictor(blk) if pred == 2 else blk

    out = np.zeros((h, w, spp), dtype=dtype.newbyteorder("="))
    # planar=2: blocks are per-plane (1 sample each), plane-major in the
    # offsets array (TIFF 6.0 §Planar Configuration); decode each plane
    # as an spp=1 image into its band slot
    nplanes = spp if planar == 2 else 1
    bspp = 1 if planar == 2 else spp
    if _T_TILE_OFFSETS in ifd:
        tw = int(ifd[_T_TILE_W][0])
        th = int(ifd[_T_TILE_H][0])
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        per = ntx * nty
        offs, cnts = ifd[_T_TILE_OFFSETS], ifd[_T_TILE_COUNTS]
        for s in range(nplanes):
            gen = blocks(
                offs[s * per : (s + 1) * per],
                cnts[s * per : (s + 1) * per], tw, th, bspp,
            )
            for i, blk in enumerate(gen):
                ty, tx = divmod(i, ntx)
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, h - y0), min(tw, w - x0)
                if planar == 2:
                    out[y0 : y0 + ys, x0 : x0 + xs, s : s + 1] = blk[:ys, :xs]
                else:
                    out[y0 : y0 + ys, x0 : x0 + xs] = blk[:ys, :xs]
    else:
        rps = int(ifd.get(_T_ROWS_PER_STRIP, [h])[0])
        per = (h + rps - 1) // rps
        offs, cnts = ifd[_T_STRIP_OFFSETS], ifd[_T_STRIP_COUNTS]
        for s in range(nplanes):
            y0 = 0
            for off, cnt in zip(offs[s * per : (s + 1) * per], cnts[s * per : (s + 1) * per]):
                rows = min(rps, h - y0)
                blk = next(blocks([off], [cnt], w, rows, bspp))
                if planar == 2:
                    out[y0 : y0 + rows, :, s : s + 1] = blk
                else:
                    out[y0 : y0 + rows] = blk
                y0 += rows

    meta = dict(
        width=w, height=h, bits=bits, samples=spp, compression=comp,
        tiled=_T_TILE_OFFSETS in ifd, predictor=pred, planar=planar,
        dtype=str(out.dtype),
    )
    if _T_PIXEL_SCALE in ifd:
        meta["pixel_scale"] = tuple(float(v) for v in ifd[_T_PIXEL_SCALE])
    if _T_TIEPOINT in ifd:
        meta["tiepoint"] = tuple(float(v) for v in ifd[_T_TIEPOINT])
    if _T_GEOKEYS in ifd:
        kd = ifd[_T_GEOKEYS]
        keys = {}
        nkeys = int(kd[3])
        for j in range(nkeys):
            kid, loc, cnt, val = (int(v) for v in kd[4 + 4 * j : 8 + 4 * j])
            if loc == 0:  # inline SHORT value
                keys[kid] = val
        meta["geo_keys"] = keys
        # 3072 ProjectedCSTypeGeoKey / 2048 GeographicTypeGeoKey
        epsg = keys.get(3072) or keys.get(2048)
        if epsg:
            meta["epsg"] = int(epsg)
    return out[..., 0] if spp == 1 else out, meta


def decode(data: bytes) -> np.ndarray:
    """TIFF bytes -> pixel array ((h, w) grayscale or (h, w, spp))."""
    return read(data)[0]


# ---------------------------------------------------------------- encoder --


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length of equal bytes
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), row[i]])
            i = j
        else:
            # literal run until the next >=3 repeat (or 128 cap)
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 2 < n and row[j] == row[j + 1] == row[j + 2])
            ):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def _apply_predictor(block: np.ndarray) -> np.ndarray:
    d = np.diff(block.astype(np.int64), axis=1)
    return np.concatenate(
        [block[:, :1].astype(np.int64), d], axis=1
    ).astype(block.dtype)


def encode(
    img: np.ndarray,
    compression: str = "deflate",
    rows_per_strip: int = 64,
    tiled: bool = False,
    tile: tuple[int, int] = (256, 256),
    predictor: int = 1,
    geo: dict | None = None,
    quality: int = 85,
    planar: int = 1,
) -> bytes:
    """Array -> little-endian TIFF bytes.

    ``img``: (h, w) or (h, w, 3), dtype uint8/uint16/int16/int32/float32.
    ``compression``: "none" | "deflate" | "packbits" | "lzw" | "jpeg"
    (lossy, uint8 gray/RGB only, ``quality`` applies; blocks are
    self-contained streams — legal per TIFF TechNote 2, no JPEGTables).
    ``geo``: optional {"pixel_scale": (sx, sy[, sz]), "tiepoint":
    (i, j, k, x, y, z), "epsg": int, "projected": bool} -> GeoTIFF tags.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    fmt = {"u": 1, "i": 2, "f": 3}[img.dtype.kind]
    bits = img.dtype.itemsize * 8
    if predictor == 2 and fmt == 3:
        raise NotImplementedError("predictor 2 on float samples")
    img = img.astype(img.dtype.newbyteorder("<"))

    comp_code = {
        "none": _COMP_NONE, "deflate": _COMP_DEFLATE_ADOBE,
        "packbits": _COMP_PACKBITS, "lzw": _COMP_LZW,
        "jpeg": _COMP_JPEG,
    }[compression]
    jpeg12 = False
    if comp_code == _COMP_JPEG:
        if img.dtype == np.uint16 and (spp == 1 or planar == 2):
            if img.max(initial=0) > 4095:
                raise ValueError("12-bit JPEG-in-TIFF samples must be <= 4095")
            jpeg12 = True
            bits = 12  # BitsPerSample 12, samples ride uint16 arrays
        elif img.dtype != np.uint8 or spp not in (1, 3):
            raise NotImplementedError(
                "JPEG-in-TIFF needs uint8 gray / RGB or uint16 gray samples"
            )
        if predictor != 1:
            raise ValueError("predictor does not apply to JPEG blocks")

    def pack(block: np.ndarray) -> bytes:
        if comp_code == _COMP_JPEG:
            from . import jpeg

            if jpeg12:
                return jpeg.encode_gray12(block[:, :, 0], quality=quality)
            if block.shape[2] == 1:  # gray image OR one planar plane
                return jpeg.encode_gray(block[:, :, 0], quality=quality)
            return jpeg.encode_rgb(block, quality=quality)
        if predictor == 2:
            block = _apply_predictor(block)
        raw = block.tobytes()
        if comp_code == _COMP_DEFLATE_ADOBE:
            return zlib.compress(raw, 6)
        if comp_code == _COMP_PACKBITS:
            return _packbits_encode(raw)
        if comp_code == _COMP_LZW:
            return _lzw_encode(raw)
        return raw

    if planar not in (1, 2):
        raise ValueError(f"PlanarConfiguration {planar}")

    def block_payloads(plane: np.ndarray) -> list[bytes]:
        ph, pw, pspp = plane.shape
        out = []
        if tiled:
            tw, th = tile
            for y0 in range(0, ph, th):
                for x0 in range(0, pw, tw):
                    blk = np.zeros((th, tw, pspp), dtype=img.dtype)
                    ys, xs = min(th, ph - y0), min(tw, pw - x0)
                    blk[:ys, :xs] = plane[y0 : y0 + ys, x0 : x0 + xs]
                    out.append(pack(blk))
        else:
            for y0 in range(0, ph, rows_per_strip):
                out.append(pack(plane[y0 : y0 + rows_per_strip]))
        return out

    payloads: list[bytes] = []
    if planar == 2:
        # separate configuration: all of plane 0's blocks, then plane
        # 1's, ... (TIFF 6.0 §Planar Configuration, plane-major order)
        for s in range(spp):
            payloads += block_payloads(np.ascontiguousarray(img[:, :, s : s + 1]))
    else:
        payloads = block_payloads(img)

    # layout: header(8) | payloads | [external tag values] | IFD
    entries: list[tuple[int, int, int, object]] = [
        (_T_WIDTH, 4, 1, w),
        (_T_HEIGHT, 4, 1, h),
        (_T_BITS, 3, spp, [bits] * spp),
        (_T_COMPRESSION, 3, 1, comp_code),
        (_T_PHOTOMETRIC, 3, 1, 2 if spp == 3 else 1),
        (_T_SPP, 3, 1, spp),
        (_T_PLANAR, 3, 1, planar),
        (_T_SAMPLE_FORMAT, 3, spp, [fmt] * spp),
    ]
    if predictor != 1:
        entries.append((_T_PREDICTOR, 3, 1, predictor))
    offsets_tag, counts_tag = (
        (_T_TILE_OFFSETS, _T_TILE_COUNTS) if tiled
        else (_T_STRIP_OFFSETS, _T_STRIP_COUNTS)
    )
    if tiled:
        entries += [(_T_TILE_W, 3, 1, tile[0]), (_T_TILE_H, 3, 1, tile[1])]
    else:
        entries.append((_T_ROWS_PER_STRIP, 4, 1, rows_per_strip))
    if geo:
        ps = list(geo.get("pixel_scale", ()))
        if ps:
            ps = (ps + [0.0, 0.0])[:3]
            entries.append((_T_PIXEL_SCALE, 12, 3, ps))
        tp = geo.get("tiepoint")
        if tp:
            entries.append((_T_TIEPOINT, 12, 6, list(tp)[:6]))
        epsg = geo.get("epsg")
        if epsg:
            projected = bool(geo.get("projected", True))
            keys = [
                (1024, 0, 1, 1 if projected else 2),  # GTModelType
                (1025, 0, 1, 1),  # GTRasterType = PixelIsArea
                ((3072 if projected else 2048), 0, 1, int(epsg)),
            ]
            kd = [1, 1, 0, len(keys)] + [v for k in keys for v in k]
            entries.append((_T_GEOKEYS, 3, len(kd), kd))

    body = bytearray()
    data_off = 8
    payload_offsets = []
    for p in payloads:
        payload_offsets.append(data_off + len(body))
        body += p
        if len(body) % 2:
            body += b"\0"  # word-align
    entries.append((offsets_tag, 4, len(payloads), payload_offsets))
    entries.append((counts_tag, 4, len(payloads), [len(p) for p in payloads]))
    entries.sort(key=lambda e: e[0])  # tags must ascend

    # external values area, then IFD
    ext = bytearray()
    ifd_entries = []

    def value_bytes(typ, cnt, val):
        letter, size = _TYPES[typ]
        vals = val if isinstance(val, (list, tuple)) else [val]
        return struct.pack("<" + letter * cnt, *vals), size * cnt

    # two passes: sizes first (to place the IFD), then real offsets
    ext_sizes = []
    for tag, typ, cnt, val in entries:
        raw, nb = value_bytes(typ, cnt, val)
        ext_sizes.append(nb if nb > 4 else 0)
    ifd_off = data_off + len(body) + sum((s + s % 2) for s in ext_sizes)
    ext_cursor = data_off + len(body)
    for tag, typ, cnt, val in entries:
        raw, nb = value_bytes(typ, cnt, val)
        if nb > 4:
            ifd_entries.append(struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", ext_cursor))
            ext += raw
            if nb % 2:
                ext += b"\0"
            ext_cursor += nb + nb % 2
        else:
            ifd_entries.append(
                struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
            )
    ifd = (
        struct.pack("<H", len(ifd_entries))
        + b"".join(ifd_entries)
        + struct.pack("<I", 0)
    )
    header = struct.pack("<2sHI", b"II", 42, ifd_off)
    assert ifd_off == data_off + len(body) + len(ext)
    return bytes(header + body + ext + ifd)


def encode_gray(img: np.ndarray, **kw) -> bytes:
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_gray needs (h, w)")
    return encode(img, **kw)


def encode_rgb(img: np.ndarray, **kw) -> bytes:
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb needs (h, w, 3)")
    return encode(img, **kw)

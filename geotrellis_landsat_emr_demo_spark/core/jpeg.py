"""Pure-numpy baseline JPEG (ITU-T T.81 / JFIF) codec — no libjpeg.

This sandbox has no image libraries, but baseline JPEG is a fully
self-describing format: quantization (DQT) and Huffman (DHT) tables
travel inside the file, so a from-scratch encoder/decoder pair needs
only the spec.  This closes the foreign-codec seam for the most common
interchange format with a REAL bitstream implementation:

- :func:`encode_gray`: 8-bit grayscale baseline sequential JFIF
  (quality-scaled Annex K luminance table, standard Annex K Huffman
  tables, correct byte stuffing / bit padding).
- :func:`decode`: baseline sequential (SOF0/SOF1), 8-bit, grayscale or
  3-component 4:4:4 (JFIF YCbCr -> RGB), restart-marker aware, reading
  ALL tables from the file.  Progressive (SOF2) and chroma subsampling
  raise ``NotImplementedError`` — the honest remainder of the seam.

The hot paths (DCT/IDCT, quantization) are vectorized numpy over all
blocks at once; only the entropy coding loop is per-symbol Python,
which is fine for the thumbnail/feature-extraction batch sizes the
multimodal operators process per Arrow batch.

Reference parity note: plays the role of the reference's raster
fetch+decode seam (ingest/.../LandsatInput.scala:23-27) for foreign
images; registered as the default "jpeg" decoder in
operators.multimodal.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- constants --

# Annex K.1 luminance quantization table (natural row order)
QTBL_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _zigzag_order() -> np.ndarray:
    """Standard zigzag scan: (row, col) pairs -> flat indices, 64 long."""
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        # even diagonals run bottom-left -> top-right: (s,0)..(0,s)
        if s % 2 == 0:
            cells.reverse()
        order.extend(cells)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()          # natural index for each zigzag position
UNZIGZAG = np.argsort(ZIGZAG)     # zigzag position for each natural index

# Annex K.3/K.5 luminance Huffman specs (BITS counts per code length 1..16
# followed by the symbol values in canonical order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: coef = C @ block @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _build_codes(bits, vals):
    """Canonical Huffman assignment (T.81 C.2): {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_qtbl(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((QTBL_LUM * scale + 50) // 100, 1, 255)


# -------------------------------------------------------------- bit I/O --


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing and
    restart-marker handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # terminating marker (EOI / next segment)

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker consumed by caller
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # spec: missing bits read as 0 past the scan
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart(self) -> bool:
        d, p = self.data, self.pos
        return p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7

    def skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.pos += 2


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# -------------------------------------------------------------- encoder --


def _plane_zz(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already /8-padded) -> (nblocks, 64) quantized
    zigzag coefficients in raster block order."""
    H, W = plane.shape
    blocks = (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ) - 128.0
    coefs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    return np.round(coefs / qtbl).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]


def _write_block(bw, blk, prev_dc, dc_codes, ac_codes) -> int:
    diff = int(blk[0]) - prev_dc
    size = int(abs(diff)).bit_length()
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        amp = diff if diff >= 0 else diff + (1 << size) - 1
        bw.write(amp, size)
    run = 0
    nz = np.nonzero(blk)[0]
    last = int(nz.max()) if nz.size else 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            if k > last:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
                break
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        amp = v if v >= 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    return int(blk[0])


def _encode(planes: list, h: int, w: int, quality: int) -> bytes:
    """Shared baseline encoder: 1 plane (grayscale) or 3 (YCbCr 4:4:4)."""
    qtbl = _scaled_qtbl(quality)
    zzs = [_plane_zz(p, qtbl) for p in planes]
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    for mcu in range(zzs[0].shape[0]):  # 1x1 sampling: MCU = one block each
        for ci, zz in enumerate(zzs):
            prev_dc[ci] = _write_block(bw, zz[mcu], prev_dc[ci], dc_codes, ac_codes)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    nc = len(planes)
    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qtbl.astype(np.uint8).ravel()[ZIGZAG]))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, nc)
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc)),
    )
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(
        0xDA,
        bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + b"\x00\x3f\x00",
    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return out


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")


def encode_gray(img: np.ndarray, quality: int = 75) -> bytes:
    """8-bit grayscale (h, w) -> baseline JFIF bytes."""
    img = np.asarray(img)
    assert img.ndim == 2 and img.dtype == np.uint8, "need (h, w) uint8"
    h, w = img.shape
    return _encode([_pad8(img.astype(np.float64))], h, w, quality)


def encode_rgb(img: np.ndarray, quality: int = 75) -> bytes:
    """8-bit RGB (h, w, 3) -> baseline JFIF bytes (YCbCr 4:4:4)."""
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _encode([_pad8(p) for p in (y, cb, cr)], h, w, quality)


# -------------------------------------------------------------- decoder --


def decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) uint8 grayscale or (h, w, 3) uint8 RGB.

    Reads every table from the file.  Raises ``NotImplementedError`` for
    progressive scans, chroma subsampling, 12-bit precision, or
    arithmetic coding."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, off).astype(np.float64)
                    off += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, off).astype(np.float64)
                    off += 128
                nat = np.empty(64)
                nat[ZIGZAG] = tbl  # stored in zigzag order
                qtbls[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {(ln, c): s for s, (c, ln) in codes.items()}
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(dict(cid=cid, hs=samp >> 4, vs=samp & 0x0F, tq=tq))
            if any(c["hs"] != comps[0]["hs"] or c["vs"] != comps[0]["vs"] for c in comps):
                raise NotImplementedError("chroma subsampling not supported")
            sof = dict(h=h, w=w, comps=comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF{marker - 0xC0} not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            ns = body[0]
            sel = {}
            for i in range(ns):
                cid, tda = body[1 + 2 * i], body[2 + 2 * i]
                sel[cid] = (tda >> 4, tda & 0x0F)
            if sof is None:
                raise ValueError("SOS before SOF")
            return _decode_scan(data, pos, sof, sel, qtbls, huff, restart_interval)
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, sof, sel, qtbls, huff, restart_interval):
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    bh, bw_ = -(-h // 8), -(-w // 8)
    nblocks = bh * bw_
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in comps]
    br = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    for mcu in range(nblocks):
        if restart_interval and mcu and mcu % restart_interval == 0:
            # the encoder byte-aligned (1-padded) before emitting RSTn; the
            # reader's _fill already stopped there, so discard pad bits,
            # consume the marker, and reset the DC predictors (F.2.1.3.1)
            if br.at_restart():
                br.skip_restart()
                prev_dc = [0] * len(comps)
        by, bx = divmod(mcu, bw_)
        for ci, comp in enumerate(comps):
            dc_tbl, ac_tbl = sel[comp["cid"]]
            qt = qtbls[comp["tq"]]
            zz = np.zeros(64, dtype=np.int64)
            size = _decode_symbol(br, huff[(0, dc_tbl)])
            prev_dc[ci] += _extend(br.read_bits(size), size)
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = _decode_symbol(br, huff[(1, ac_tbl)])
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 0x0F
                if k > 63:
                    break
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            coef = np.empty(64)
            coef[ZIGZAG] = zz  # zigzag -> natural order
            block = _C.T @ (coef.reshape(8, 8) * qt) @ _C + 128.0
            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    planes = [np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8) for p in planes]
    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:  # JFIF YCbCr -> RGB
        y, cb, cr = (p.astype(np.float64) for p in planes)
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(planes)}-component scan")

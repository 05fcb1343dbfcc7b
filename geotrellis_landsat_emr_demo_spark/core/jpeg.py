"""Pure-numpy baseline JPEG (ITU-T T.81 / JFIF) codec — no libjpeg.

This sandbox has no image libraries, but baseline JPEG is a fully
self-describing format: quantization (DQT) and Huffman (DHT) tables
travel inside the file, so a from-scratch encoder/decoder pair needs
only the spec.  This closes the foreign-codec seam for the most common
interchange format with a REAL bitstream implementation:

- :func:`encode_gray`: 8-bit grayscale baseline sequential JFIF
  (quality-scaled Annex K luminance table, standard Annex K Huffman
  tables, correct byte stuffing / bit padding).
- :func:`decode`: baseline sequential (SOF0/SOF1) AND progressive
  (SOF2, spectral selection + successive approximation, per T.81 G.2 /
  the libjpeg scan algorithm), 8-bit, grayscale or 3-component JFIF
  YCbCr with ARBITRARY integer sampling factors (4:4:4, 4:2:0, 4:2:2),
  restart-marker aware, reading ALL tables from the file.  All scans
  decode into a coefficient store; dequantization + IDCT then run ONCE,
  vectorized over every block.  12-bit precision decodes on SOF1/SOF2
  (extended sequential / progressive — the precision real JPEG-in-TIFF
  remote-sensing archives ship, comp 7 per TIFF TechNote 2; the
  reference reaches it through libjpeg inside GeoTrellis's reader,
  ingest/.../LandsatInput.scala:23-27) -> (h, w) uint16.  Hierarchical
  / arithmetic-coded streams still raise ``NotImplementedError``.

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


def _plane_zz(plane: np.ndarray, qtbl: np.ndarray, center: float = 128.0) -> np.ndarray:
    """(H, W) float plane (already /8-padded) -> (nblocks, 64) quantized
    zigzag coefficients in raster block order.  ``center`` is the level
    shift, 2^(P-1) for precision P."""
    H, W = plane.shape
    blocks = (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ) - center
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


# Flat AC Huffman table for progressive scans: every symbol 0x00..0xFF is
# representable (EOBn run categories, ZRL, any run/size), 255 symbols at 9
# bits + one at 10 — valid canonical table, carried in the file's DHT like
# any other, so the decoder needs nothing special.  Compression is not the
# point of the progressive fixtures; correctness of the scan machinery is.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))

# 12-bit DC table: DIFF categories 0..15 (T.81 Table F.6), 16 symbols at
# 5 bits each — canonical, the all-ones code (11111) stays unused as the
# spec requires.  The standard Annex K table stops at category 11, which
# a 12-bit DC difference (up to +-32760) overflows.
DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(16))


def _box_down(p: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-mean downsample by (fx, fy), edge-padded to a multiple first."""
    h, w = p.shape
    H, W = -(-h // fy) * fy, -(-w // fx) * fx
    P = np.pad(p, ((0, H - h), (0, W - w)), mode="edge")
    return P.reshape(H // fy, fy, W // fx, fx).mean(axis=(1, 3))


def _enc_ac_first(bw, blocks, ss, se, al, ac_codes):
    """Progressive AC first scan (Ah=0) for one component, raster block
    order, with EOB-run accumulation (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            cat = eobrun.bit_length() - 1
            code, length = ac_codes[cat << 4]
            bw.write(code, length)
            if cat:
                bw.write(eobrun - (1 << cat), cat)
            eobrun = 0

    for zz in blocks:
        t = [int(v) for v in zz[ss : se + 1]]
        tv = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in t]
        nz = [i for i, v in enumerate(tv) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        last = nz[-1]
        for i, v in enumerate(tv):
            if i > last:
                eobrun += 1
                break
            if v == 0:
                r += 1
                continue
            while r >= 16:
                code, length = ac_codes[0xF0]
                bw.write(code, length)
                r -= 16
            size = abs(v).bit_length()
            code, length = ac_codes[(r << 4) | size]
            bw.write(code, length)
            amp = v if v >= 0 else v + (1 << size) - 1
            bw.write(amp, size)
            r = 0
        else:
            pass
    flush_eob()


def _enc_ac_refine(bw, blocks, ss, se, al, ac_codes):
    """Progressive AC refinement scan (Ah=Al+1) for one component.

    Positional simulation of the decoder's walk: each symbol segment
    (ZRL or run|1) is followed by EXACTLY the correction bits of the
    history-nonzero coefficients the decoder passes while consuming that
    segment; blocks/tails with no newly-significant coefficient join an
    EOB run whose buffered correction bits (tail of the starting block,
    then full bands of subsequent run members, in order) follow the EOBn
    symbol (T.81 G.1.2.3 / libjpeg jcphuff semantics)."""
    eobrun = 0
    bits_pending: list[int] = []

    def flush_eob():
        nonlocal eobrun, bits_pending
        if eobrun:
            cat = eobrun.bit_length() - 1
            code, length = ac_codes[cat << 4]
            bw.write(code, length)
            if cat:
                bw.write(eobrun - (1 << cat), cat)
            eobrun = 0
            for b in bits_pending:
                bw.write(b, 1)
            bits_pending = []

    for zz in blocks:
        t = [abs(int(v)) >> al for v in zz[ss : se + 1]]
        sign = [1 if int(v) >= 0 else 0 for v in zz[ss : se + 1]]
        n = len(t)
        new_idx = [i for i in range(n) if t[i] == 1]
        i = 0
        for q in new_idx:
            r = sum(1 for j in range(i, q) if t[j] == 0)
            while r > 15:
                # ZRL consumes 16 zero-history positions; its correction
                # bits are the history-nonzero coefficients interleaved
                # within that window (decoder corrects them in-walk)
                flush_eob()
                cnt, j, corr = 0, i, []
                while True:
                    if t[j] == 0:
                        cnt += 1
                        if cnt == 16:
                            break
                    elif t[j] > 1:
                        corr.append(t[j] & 1)
                    j += 1
                code, length = ac_codes[0xF0]
                bw.write(code, length)
                for b in corr:
                    bw.write(b, 1)
                i = j + 1
                r -= 16
            flush_eob()
            code, length = ac_codes[(r << 4) | 1]
            bw.write(code, length)
            bw.write(sign[q], 1)
            for j in range(i, q):
                if t[j] > 1:
                    bw.write(t[j] & 1, 1)
            i = q + 1
        if i < n:  # tail (or sig-free block) joins the EOB run
            eobrun += 1
            bits_pending += [t[j] & 1 for j in range(i, n) if t[j] > 1]
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode(
    planes: list,
    h: int,
    w: int,
    quality: int,
    samp: list | None = None,
    progressive: bool = False,
    prec: int = 8,
) -> bytes:
    """Shared encoder: 1 plane (grayscale) or 3 (YCbCr), arbitrary
    integer sampling factors, baseline sequential or progressive
    (spectral selection + successive approximation, libjpeg-style
    script).  ``prec`` 8 or 12; 12-bit writes SOF1 (extended
    sequential) / SOF2, a pq=1 (16-bit) DQT, and the DC12 table."""
    nc = len(planes)
    center = float(1 << (prec - 1))
    samp = samp or [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qtbl = _scaled_qtbl(quality)
    comps = []
    for p, (hs, vs) in zip(planes, samp):
        if hs != hmax or vs != vmax:
            p = _box_down(p, hmax // hs, vmax // vs)
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        P = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        zz = _plane_zz(P, qtbl, center).reshape(mcuy * vs, mcux * hs, 64)
        # non-interleaved (progressive AC) scans cover the component's OWN
        # block grid, not the MCU-padded one (T.81 A.2.2)
        cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
        comps.append(
            dict(zz=zz, hs=hs, vs=vs, sbx=-(-cw // 8), sby=-(-ch // 8))
        )

    dc_bits, dc_vals = (DC12_BITS, DC12_VALS) if prec == 12 else (DC_BITS, DC_VALS)
    dc_codes = _build_codes(dc_bits, dc_vals)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos_seg(sel, ss, se, ah, al):
        return seg(
            0xDA,
            bytes([len(sel)])
            + b"".join(bytes([ci + 1, 0x00]) for ci in sel)
            + bytes([ss, se, (ah << 4) | al]),
        )

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    if prec == 12:
        out += seg(  # PqTq = (1 << 4) | 0: 16-bit values, table 0
            0xDB,
            b"\x10" + qtbl.astype(">u2").ravel()[ZIGZAG].tobytes(),
        )
    else:
        out += seg(0xDB, b"\x00" + bytes(qtbl.astype(np.uint8).ravel()[ZIGZAG]))
    out += seg(
        0xC2 if progressive else (0xC1 if prec == 12 else 0xC0),
        struct.pack(">BHHB", prec, h, w, nc)
        + b"".join(
            bytes([i + 1, (c["hs"] << 4) | c["vs"], 0])
            for i, c in enumerate(comps)
        ),
    )
    out += seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))

    def mcu_blocks(write_block):
        """Walk MCU-interleaved block order, calling write_block(ci, zz)."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, c in enumerate(comps):
                    for v in range(c["vs"]):
                        for hh in range(c["hs"]):
                            write_block(
                                ci, c["zz"][my * c["vs"] + v, mx * c["hs"] + hh]
                            )

    if not progressive:
        ac_bits, ac_vals = (
            (PROG_AC_BITS, PROG_AC_VALS) if prec == 12 else (AC_BITS, AC_VALS)
        )
        ac_codes = _build_codes(ac_bits, ac_vals)
        out += seg(0xC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))
        bw = _BitWriter()
        prev = [0] * nc

        def wblk(ci, zz):
            prev[ci] = _write_block(bw, zz, prev[ci], dc_codes, ac_codes)

        mcu_blocks(wblk)
        out += sos_seg(list(range(nc)), 0, 63, 0, 0)
        out += bw.flush()
        out += b"\xff\xd9"
        return out

    # ---- progressive: the libjpeg standard script shape ----
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
    out += seg(0xC4, b"\x10" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS))

    def comp_blocks(ci):
        """Raster order over the component's OWN (unpadded-scan) grid."""
        c = comps[ci]
        return c["zz"][: c["sby"], : c["sbx"]].reshape(-1, 64)

    # 1) DC first, Al=1, interleaved
    bw = _BitWriter()
    prev = [0] * nc

    def wdc(ci, zz):
        val = int(zz[0]) >> 1  # point transform (arithmetic shift)
        diff = val - prev[ci]
        prev[ci] = val
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            bw.write(amp, size)

    mcu_blocks(wdc)
    out += sos_seg(list(range(nc)), 0, 0, 0, 1)
    out += bw.flush()
    # 2) AC first scans per component: band 1-5 at Al=2, band 6-63 at Al=2
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            bw = _BitWriter()
            _enc_ac_first(bw, comp_blocks(ci), ss, se, 2, ac_codes)
            out += sos_seg([ci], ss, se, 0, 2)
            out += bw.flush()
    # 3) AC refine Ah=2 -> Al=1 per component
    for ci in range(nc):
        bw = _BitWriter()
        _enc_ac_refine(bw, comp_blocks(ci), 1, 63, 1, ac_codes)
        out += sos_seg([ci], 1, 63, 2, 1)
        out += bw.flush()
    # 4) DC refine Ah=1 -> Al=0, interleaved
    bw = _BitWriter()

    def wdcr(ci, zz):
        bw.write(int(zz[0]) & 1, 1)

    mcu_blocks(wdcr)
    out += sos_seg(list(range(nc)), 0, 0, 1, 0)
    out += bw.flush()
    # 5) AC refine Ah=1 -> Al=0 per component
    for ci in range(nc):
        bw = _BitWriter()
        _enc_ac_refine(bw, comp_blocks(ci), 1, 63, 0, ac_codes)
        out += sos_seg([ci], 1, 63, 1, 0)
        out += bw.flush()
    out += b"\xff\xd9"
    return out


def encode_gray(
    img: np.ndarray, quality: int = 75, progressive: bool = False
) -> bytes:
    """8-bit grayscale (h, w) -> JFIF bytes (baseline or progressive)."""
    img = np.asarray(img)
    assert img.ndim == 2 and img.dtype == np.uint8, "need (h, w) uint8"
    h, w = img.shape
    return _encode(
        [img.astype(np.float64)], h, w, quality, progressive=progressive
    )


def encode_gray12(
    img: np.ndarray, quality: int = 75, progressive: bool = False
) -> bytes:
    """12-bit grayscale (h, w) uint16 (values <= 4095) -> extended
    sequential (SOF1) or progressive (SOF2) JPEG bytes."""
    img = np.asarray(img)
    assert img.ndim == 2 and img.dtype == np.uint16, "need (h, w) uint16"
    if img.max(initial=0) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    h, w = img.shape
    return _encode(
        [img.astype(np.float64)], h, w, quality,
        progressive=progressive, prec=12,
    )


_SUBSAMP = {"444": [(1, 1)] * 3, "422": [(2, 1), (1, 1), (1, 1)],
            "420": [(2, 2), (1, 1), (1, 1)]}


def encode_rgb(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """8-bit RGB (h, w, 3) -> JFIF bytes (YCbCr; 4:4:4 / 4:2:2 / 4:2:0
    chroma subsampling; baseline or progressive)."""
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _encode(
        [y, cb, cr], h, w, quality,
        samp=_SUBSAMP[subsampling], progressive=progressive,
    )


# -------------------------------------------------------------- decoder --


def decode(data: bytes) -> np.ndarray:
    """JFIF bytes -> (h, w) uint8 grayscale or (h, w, 3) uint8 RGB.

    Baseline sequential and progressive, any integer sampling factors;
    reads every table from the file.  Raises ``NotImplementedError`` for
    hierarchical/lossless/arithmetic variants and 12-bit precision."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    coefs = None  # per-component (nby, nbx, 64) zigzag coefficient store
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
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit precision")
            if prec == 12 and marker == 0xC0:
                raise ValueError("baseline SOF0 must be 8-bit (T.81 B.2.2)")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(dict(cid=cid, hs=samp >> 4, vs=samp & 0x0F, tq=tq))
            sof = dict(h=h, w=w, comps=comps, progressive=marker == 0xC2,
                       prec=prec)
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            if any(hmax % c["hs"] or vmax % c["vs"] for c in comps):
                raise NotImplementedError("non-integer sampling ratios")
            sof["hmax"], sof["vmax"] = hmax, vmax
            sof["mcux"] = -(-w // (8 * hmax))
            sof["mcuy"] = -(-h // (8 * vmax))
            for c in comps:
                c["w"] = -(-w * c["hs"] // hmax)   # ceil(w*hs/hmax)
                c["h"] = -(-h * c["vs"] // vmax)
                # storage is MCU-padded; non-interleaved scans use the
                # component's own (unpadded) block grid
                c["nbx"] = sof["mcux"] * c["hs"]
                c["nby"] = sof["mcuy"] * c["vs"]
                c["sbx"] = -(-c["w"] // 8)
                c["sby"] = -(-c["h"] // 8)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF{marker - 0xC0} not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            if coefs is None:
                coefs = [
                    np.zeros((c["nby"], c["nbx"], 64), dtype=np.int32)
                    for c in sof["comps"]
                ]
            ns = body[0]
            sel = []
            for i in range(ns):
                cid, tda = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    j for j, c in enumerate(sof["comps"]) if c["cid"] == cid
                )
                sel.append((ci, tda >> 4, tda & 0x0F))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            scan = dict(sel=sel, ss=ss, se=se, ah=a >> 4, al=a & 0x0F)
            pos = _scan_into(
                data, pos, sof, scan, huff, restart_interval, coefs
            )
        # APPn / COM / others: skipped
    if coefs is None:
        raise ValueError("no SOS marker found")
    return _reconstruct(sof, coefs, qtbls)


def _decode_seq_block(br, huff, dc_tbl, ac_tbl, prev_dc, ci, zz):
    """Sequential (baseline) block: DC diff + AC run-length into zz."""
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


def _decode_ac_first(br, table, zz, ss, se, al, state):
    """Progressive AC first scan (Ah=0): T.81 G.2.2 with EOB runs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = _decode_symbol(br, table)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            break
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _decode_ac_refine(br, table, zz, ss, se, al, state):
    """Progressive AC refinement scan (Ah=Al+1): the libjpeg
    decode_mcu_AC_refine algorithm — newly-significant coefficients get a
    sign bit, already-nonzero ones a correction bit, including during EOB
    runs."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if zz[k] != 0 and br.read_bit():
            if (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = _decode_symbol(br, table)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    # run count INCLUDES this block: the tail below still
                    # emits correction bits for k..se before decrementing
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-HISTORY coefficients
            else:
                # s is 1 by construction: magnitude becomes 1 at this Al
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            correct(k)
            k += 1
        state["eobrun"] -= 1


def _scan_into(data, pos, sof, scan, huff, restart_interval, coefs):
    """Decode one scan's entropy data into the coefficient store; returns
    the byte position of the next marker."""
    comps = sof["comps"]
    sel, ss, se = scan["sel"], scan["ss"], scan["se"]
    ah, al = scan["ah"], scan["al"]
    progressive = sof["progressive"]
    if progressive and ss > 0 and len(sel) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")
    br = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    state = {"eobrun": 0}
    interleaved = len(sel) > 1

    if interleaved:
        nunits = sof["mcux"] * sof["mcuy"]
    else:
        ci = sel[0][0]
        c = comps[ci]
        nunits = c["sbx"] * c["sby"]

    for unit in range(nunits):
        if restart_interval and unit and unit % restart_interval == 0:
            if br.at_restart():
                br.skip_restart()
                prev_dc = [0] * len(comps)
                state["eobrun"] = 0
        if interleaved:
            my, mx = divmod(unit, sof["mcux"])
            for ci, dc_tbl, ac_tbl in sel:
                c = comps[ci]
                for v in range(c["vs"]):
                    for hh in range(c["hs"]):
                        zz = coefs[ci][my * c["vs"] + v, mx * c["hs"] + hh]
                        if not progressive:
                            _decode_seq_block(
                                br, huff, dc_tbl, ac_tbl, prev_dc, ci, zz
                            )
                        elif ss == 0 and ah == 0:  # DC first
                            size = _decode_symbol(br, huff[(0, dc_tbl)])
                            prev_dc[ci] += _extend(br.read_bits(size), size)
                            zz[0] = prev_dc[ci] << al
                        elif ss == 0:  # DC refine
                            if br.read_bit():
                                zz[0] = int(zz[0]) | (1 << al)
                        else:  # pragma: no cover — rejected above
                            raise ValueError("interleaved AC scan")
        else:
            ci, dc_tbl, ac_tbl = sel[0]
            c = comps[ci]
            by, bx = divmod(unit, c["sbx"])
            zz = coefs[ci][by, bx]
            if not progressive:
                _decode_seq_block(br, huff, dc_tbl, ac_tbl, prev_dc, ci, zz)
            elif ss == 0 and ah == 0:
                size = _decode_symbol(br, huff[(0, dc_tbl)])
                prev_dc[ci] += _extend(br.read_bits(size), size)
                zz[0] = prev_dc[ci] << al
            elif ss == 0:
                if br.read_bit():
                    zz[0] = int(zz[0]) | (1 << al)
            elif ah == 0:
                _decode_ac_first(br, huff[(1, ac_tbl)], zz, ss, se, al, state)
            else:
                _decode_ac_refine(br, huff[(1, ac_tbl)], zz, ss, se, al, state)
    # consume any trailing restart marker so pos lands on the next segment
    if br.at_restart():
        br.skip_restart()
    return br.pos


def _reconstruct(sof, coefs, qtbls):
    """Dequantize + IDCT every component in ONE vectorized pass, upsample
    to full resolution, color-convert.  Precision-aware: level shift
    2^(P-1), clip to 2^P - 1, uint8 out for P=8 / uint16 for P=12."""
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    prec = sof.get("prec", 8)
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    odt = np.uint8 if prec == 8 else np.uint16
    planes = []
    for ci, c in enumerate(comps):
        qt = qtbls[c["tq"]].ravel()
        zz = coefs[ci].reshape(-1, 64).astype(np.float64)
        nat = np.empty_like(zz)
        nat[:, ZIGZAG] = zz  # zigzag -> natural order, all blocks at once
        blocks = (nat * qt[None, :]).reshape(-1, 8, 8)
        # IDCT-II for every block: X = C.T @ coef @ C
        pix = np.einsum("xu,nuv,vy->nxy", _C.T, blocks, _C) + center
        nby, nbx = c["nby"], c["nbx"]
        plane = (
            pix.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )[: c["h"], : c["w"]]
        vfac, hfac = sof["vmax"] // c["vs"], sof["hmax"] // c["hs"]
        if vfac > 1 or hfac > 1:
            plane = np.repeat(np.repeat(plane, vfac, axis=0), hfac, axis=1)
        planes.append(plane[:h, :w])
    planes = [np.clip(np.round(p), 0, maxv).astype(odt) for p in planes]
    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:  # JFIF YCbCr -> RGB (chroma centered at 2^(P-1))
        y, cb, cr = (p.astype(np.float64) for p in planes)
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
        return np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, maxv
        ).astype(odt)
    raise NotImplementedError(f"{len(planes)}-component image")

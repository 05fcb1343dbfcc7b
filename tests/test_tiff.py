"""Pure-numpy baseline TIFF/GeoTIFF codec (core.tiff): lossless
roundtrips across every layout x compression x dtype combination, byte
orders, predictor, GeoTIFF tag carry, the honest NotImplementedError
seam, and the multimodal-registry e2e (the same strategy as
tests/test_jpeg.py for the reference's actual scene container,
LandsatInput.scala:24)."""

import numpy as np
import pytest

from geotrellis_landsat_emr_demo_spark.core import tiff


def _img(h=37, w=53, dtype=np.uint16, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    hi = 255 if np.dtype(dtype).itemsize == 1 else 40_000
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, hi, shape).astype(dtype)


@pytest.mark.parametrize("compression", ["none", "deflate", "packbits", "lzw"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_striped_roundtrip(compression, dtype):
    img = _img(dtype=dtype)
    data = tiff.encode_gray(img, compression=compression, rows_per_strip=16)
    out, meta = tiff.read(data)
    assert (out == img).all() and out.dtype == img.dtype
    assert (meta["width"], meta["height"]) == (53, 37)
    assert not meta["tiled"]


@pytest.mark.parametrize("compression", ["none", "deflate", "packbits", "lzw"])
def test_tiled_roundtrip(compression):
    img = _img(h=70, w=100)
    data = tiff.encode_gray(img, compression=compression, tiled=True, tile=(32, 32))
    out, meta = tiff.read(data)
    assert (out == img).all()
    assert meta["tiled"]


def test_rgb_and_predictor_and_signed_float():
    rgb = _img(channels=3, dtype=np.uint8)
    out = tiff.decode(tiff.encode_rgb(rgb, compression="deflate"))
    assert out.shape == rgb.shape and (out == rgb).all()
    # horizontal-differencing predictor, 8 and 16 bit
    for dt in (np.uint8, np.uint16):
        img = _img(dtype=dt, seed=3)
        data = tiff.encode_gray(img, compression="deflate", predictor=2)
        assert (tiff.decode(data) == img).all()
    # signed + float sample formats
    si = (_img(dtype=np.uint16, seed=4).astype(np.int32) - 20_000).astype(np.int16)
    assert (tiff.decode(tiff.encode_gray(si)) == si).all()
    fl = np.linspace(-1, 1, 37 * 53, dtype=np.float32).reshape(37, 53)
    got = tiff.decode(tiff.encode_gray(fl))
    assert got.dtype == np.float32 and np.array_equal(got, fl)


def test_big_endian_decode():
    """A hand-built big-endian (MM) striped file decodes identically."""
    import struct

    img = _img(h=4, w=5, dtype=np.uint16, seed=9)
    raw = img.astype(">u2").tobytes()
    # header | pixel data | IFD  (tags: 256,257,258,259,262,273,277,278,279)
    entries = [
        (256, 3, 1, 5), (257, 3, 1, 4), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 4),
        (279, 4, 1, len(raw)),
    ]
    ifd_off = 8 + len(raw)
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        fmtc = {3: "H", 4: "I"}[typ]
        v = struct.pack(">" + fmtc, val)
        ifd += struct.pack(">HHI", tag, typ, cnt) + v.ljust(4, b"\0")
    ifd += struct.pack(">I", 0)
    data = struct.pack(">2sHI", b"MM", 42, ifd_off) + raw + ifd
    out, meta = tiff.read(data)
    assert (out == img).all()


def test_geotiff_tags_roundtrip():
    img = _img(h=16, w=16)
    geo = dict(
        pixel_scale=(30.0, 30.0),
        tiepoint=(0, 0, 0, 399960.0, 4100040.0, 0.0),
        epsg=32654,
        projected=True,
    )
    _, meta = tiff.read(tiff.encode_gray(img, geo=geo))
    assert meta["pixel_scale"] == (30.0, 30.0, 0.0)
    assert meta["tiepoint"] == (0.0, 0.0, 0.0, 399960.0, 4100040.0, 0.0)
    assert meta["epsg"] == 32654
    assert meta["geo_keys"][1024] == 1  # projected model type


def test_unsupported_variants_raise():
    img = _img(h=8, w=8, dtype=np.uint8)
    import struct

    def with_comp(code: int) -> bytes:
        data = bytearray(tiff.encode_gray(img, compression="none"))
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (n,) = struct.unpack_from("<H", data, ifd_off)
        for i in range(n):
            tag = struct.unpack_from("<H", data, ifd_off + 2 + 12 * i)[0]
            if tag == 259:
                struct.pack_into("<H", data, ifd_off + 2 + 12 * i + 8, code)
        return bytes(data)

    # CCITT G4 (4) stays unsupported (JPEG 7 is handled since r5)
    with pytest.raises(NotImplementedError, match="compression 4"):
        tiff.decode(with_comp(4))
    # comp 7 whose payload is not a JPEG stream: decoder rejects it
    with pytest.raises(ValueError, match="JPEG|SOI|marker"):
        tiff.decode(with_comp(7))
    with pytest.raises(ValueError, match="TIFF"):
        tiff.decode(b"\x89PNG\r\n")
    # BigTIFF with a non-8 offset size is the (rare) unsupported corner
    bad_big = struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16)
    with pytest.raises(NotImplementedError, match="BigTIFF offset size"):
        tiff.decode(bad_big)


def test_multimodal_registry_e2e(spark):
    """fmt='tiff' binary images decode through the default registry
    inside the Spark operator — real pixels, real stats."""
    import pandas as pd

    from geotrellis_landsat_emr_demo_spark.operators import multimodal

    imgs = {f"t{i}": _img(h=24 + 8 * i, w=40, seed=i) for i in range(3)}
    pdf = pd.DataFrame(
        [
            dict(
                image_id=k,
                bytes=tiff.encode_gray(v, compression="deflate", tiled=(i % 2 == 0)),
                fmt="tiff",
            )
            for i, (k, v) in enumerate(imgs.items())
        ]
    )
    out = multimodal.decode_stats(spark.createDataFrame(pdf)).toPandas()
    assert set(out.image_id) == set(imgs)
    for r in out.itertuples(index=False):
        ref = imgs[r.image_id].astype(float)
        ref = ref[ref != 0]
        assert abs(r.mean - ref.mean()) < 1e-6  # lossless container


def test_ingest_e2e_geotiff_payload(spark, tsmall_catalog):
    """Ingest e2e with GeoTIFF scene payloads — the reference's actual
    container (LandsatInput.scala:24): the same t-small scenes encoded as
    multiband GeoTIFF (geo tags carried) produce BIT-IDENTICAL leaf tiles
    to the GTRS-payload ingest, with no ingest-side changes (container
    dispatch in kernels.decode_payload)."""
    import os
    import shutil

    import pandas as pd

    from conftest import SCRATCH
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.core import kernels as K
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    pdf = fixtures.images_pdf("t-small")
    rows = []
    for r in pdf.itertuples(index=False):
        arr = K.decode_payload(r.bytes)  # (bands, h, w) uint16
        geo = dict(
            pixel_scale=((r.xmax - r.xmin) / r.w, (r.ymax - r.ymin) / r.h),
            tiepoint=(0, 0, 0, r.xmin, r.ymax, 0),
            epsg=3857,
        )
        d = r._asdict()
        d["bytes"] = tiff.encode(
            arr.transpose(1, 2, 0), compression="deflate", geo=geo
        )
        d["fmt"] = "geotiff"
        rows.append(d)
    root = os.path.join(SCRATCH, "tiffingest")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.append_pandas(pd.DataFrame(rows), "images")
    cat.append_pandas(fixtures.aoi_pdf("t-small"), "aoi")
    cat.append_pandas(fixtures.query_points_pdf("t-small"), "query_points")
    ingest.ingest_images(spark, cat, "landsat", max_zoom=13, min_zoom=12)

    want = tsmall_catalog.read_pandas(
        "tiles", columns=["zoom", "x", "y", "ts", "tile"]
    )
    got = cat.read_pandas("tiles", columns=["zoom", "x", "y", "ts", "tile"])
    want = want[want.zoom >= 12]
    key = lambda df: {  # noqa: E731
        (int(r.zoom), int(r.x), int(r.y), pd.Timestamp(r.ts).value): r.tile
        for r in df.itertuples(index=False)
    }
    w_map, g_map = key(want), key(got)
    assert set(w_map) == set(g_map) and len(g_map) > 0
    for k in w_map:
        assert (
            K.decode_payload(w_map[k]) == K.decode_payload(g_map[k])
        ).all(), k


def test_lzw_roundtrip_property():
    """TIFF 6.0 §13 LZW: arbitrary byte streams round-trip, including
    table-reset (>4093 entries) and width-change boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=4000))
    def check(raw):
        assert tiff._lzw_decode(tiff._lzw_encode(raw), len(raw)) == raw

    check()
    # deterministic long/low-entropy stream crosses 9->10->11->12 bit
    # widths and the 4094-entry table reset
    rng = np.random.default_rng(11)
    long = bytes(rng.integers(0, 17, 250_000).astype(np.uint8))
    assert tiff._lzw_decode(tiff._lzw_encode(long), len(long)) == long


def test_lzw_width_boundary_exact():
    """Pin the early-change boundary: a stream engineered to emit the
    254th new table entry (code 511) must decode identically — the
    decoder bumps width one entry before the encoder's table fills."""
    # distinct 2-byte pairs force one table add per pair
    raw = bytes(bytearray((i % 256, (i * 7 + 3) % 256))[j] for i in range(400) for j in range(2))
    enc = tiff._lzw_encode(raw)
    assert tiff._lzw_decode(enc, len(raw)) == raw


def test_lzw_overestimated_expect_at_bump_boundary():
    """Encoder's final flush adds no table entry, so a stream whose LAST
    data code lands the decoder exactly on the early-change threshold
    leaves the decoder one width ahead of the encoder's trailing EOI.
    With an exact ``expect`` the decoder returns early and never sees it;
    with an OVERESTIMATED expect (cog.CogLevel's short unpadded final
    strips) it must still stop cleanly at the misaligned EOI, not raise
    'corrupt LZW stream'."""
    # n=253 distinct bytes -> decoder table hits 510 (bump to 10 bits) on
    # the last data code; encoder next_code stays 510 (no bump), EOI at 9.
    for n in range(245, 262):  # straddle the boundary on both sides
        raw = bytes(i % 256 for i in range(n))
        enc = tiff._lzw_encode(raw)
        got = tiff._lzw_decode(enc, n + 1000)  # overestimated expect
        assert got == raw, f"n={n}"


def test_lzw_final_code_514_without_eoi_not_truncated():
    """A non-conformant stream whose LAST data code is 514/515 (top
    width-1 bits spell EOI) and that omits EOI must decode fully: the
    end-of-stream heuristic only applies when the decoder table is
    exactly at a just-bumped width threshold (the real early-change
    mismatch), not on ordinary final data codes."""
    CLEAR = 256
    # literals 0..255 (255 appends -> table 513, width 10 after 510),
    # two more literals (-> 515), then final code 514 with no EOI.
    codes = [CLEAR] + list(range(256)) + [0, 1, 514]

    # bit-pack at the decoder's width schedule
    acc = nbits = 0
    out = bytearray()
    table_len, width, prev = 258, 9, False
    for c in codes:
        acc = (acc << width) | c
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        if c == CLEAR:
            table_len, width, prev = 258, 9, False
            continue
        if prev:
            table_len += 1
            if table_len >= (1 << width) - 2 and width < 12:
                width += 1
        prev = True
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)

    # reference decode (no heuristic): table[514] was appended while
    # processing literal 1 after prev=b"\x00" -> entry b"\x00\x01"
    expect = bytes(range(256)) + b"\x00\x01" + b"\x00\x01"
    got = tiff._lzw_decode(bytes(out), len(expect))
    assert got == expect


def test_bigtiff_inline_rational_tag():
    """BigTIFF count-1 RATIONAL (8 bytes) is legitimately INLINE; the
    old RATIONAL-size double-count treated it as external and
    dereferenced the value as an offset (struct.error on a valid file)."""
    import struct

    # hand-built BigTIFF IFD: one entry, tag=282 (XResolution) typ=5
    # cnt=1, value (300, 1) packed INLINE in the 8-byte slot
    ifd = (
        struct.pack("<Q", 1)
        + struct.pack("<HHQII", 282, 5, 1, 300, 1)
        + struct.pack("<Q", 0)
    )
    out = tiff._read_ifd(ifd, "<", 0, big=True)
    assert out[282][0] == pytest.approx(300.0)
    # classic TIFF: the same tag must still resolve EXTERNALLY (8 > 4
    # inline bytes) — guard against over-correcting the size fix
    ifd_c = (
        struct.pack("<H", 1)
        + struct.pack("<HHII", 282, 5, 1, 18)  # offset 18 -> payload below
        + struct.pack("<I", 0)
        + struct.pack("<II", 72, 1)
    )
    out_c = tiff._read_ifd(ifd_c, "<", 0, big=False)
    assert out_c[282][0] == pytest.approx(72.0)


def test_decode_payload_clips_wide_tiff_samples():
    """int16/int32/float GeoTIFF samples saturate at [0, 65535] through
    decode_payload — matching sources/cog.py's clip on the same cast —
    instead of wrapping mod 65536 (negative -> huge positive)."""
    from geotrellis_landsat_emr_demo_spark.core import kernels

    si = (_img(dtype=np.uint16, seed=4).astype(np.int32) - 20_000).astype(np.int16)
    got = kernels.decode_payload(tiff.encode_gray(si))
    assert got.dtype == np.uint16
    assert (got == np.clip(si, 0, 65535).astype(np.uint16)).all()
    fl = np.linspace(-10.0, 70_000.0, 37 * 53, dtype=np.float32).reshape(37, 53)
    got = kernels.decode_payload(tiff.encode_gray(fl))
    assert (got == np.clip(np.rint(fl), 0, 65535).astype(np.uint16)).all()
    # NaN samples map to the NoData sentinel 0 (a NaN through np.clip
    # survives into an undefined float->uint16 cast otherwise), and the
    # rounding is half-to-even BEFORE the clip on both ingest routes
    # (decode_payload and the windowed COG source share saturate_to_u16)
    fl2 = fl.copy()
    fl2[::5, ::3] = np.nan
    fl2[1, 1] = 2.5  # rint half-to-even -> 2, a plain truncation gives 2 too,
    fl2[1, 2] = 3.5  # but 3.5 -> 4 separates rint from truncation
    got2 = kernels.decode_payload(tiff.encode_gray(fl2))
    want2 = np.clip(np.where(np.isnan(fl2), 0.0, np.rint(fl2)), 0, 65535)
    assert (got2 == want2.astype(np.uint16)).all()
    assert (got2[0, ::5, ::3] == 0).all()
    assert np.array_equal(got2[0], kernels.saturate_to_u16(fl2))


@pytest.mark.parametrize("compression", ["none", "deflate", "packbits", "lzw"])
@pytest.mark.parametrize("tiled", [False, True])
def test_planar_separate_roundtrip(compression, tiled):
    """PlanarConfiguration=2 (each sample's blocks stored as a separate
    plane, plane-major offsets — TIFF 6.0): lossless roundtrip across
    strip/tile layouts and codecs, multiband uint16."""
    img = _img(h=70, w=100, channels=3)
    data = tiff.encode(
        img, compression=compression, tiled=tiled, tile=(32, 32),
        rows_per_strip=16, planar=2,
    )
    out, meta = tiff.read(data)
    assert (out == img).all() and out.dtype == img.dtype
    assert meta["planar"] == 2 and meta["samples"] == 3


def test_planar_separate_predictor_and_chunky_equivalence():
    """planar=2 + predictor 2 roundtrips; the decoded pixels equal the
    chunky (planar=1) encoding of the same image."""
    img = _img(h=41, w=29, channels=4, seed=3)
    a, _ = tiff.read(tiff.encode(img, compression="deflate", planar=2, predictor=2))
    b, _ = tiff.read(tiff.encode(img, compression="deflate", planar=1, predictor=2))
    assert (a == img).all() and (b == img).all()


def test_planar_jpeg_roundtrip():
    """planar=2 + comp 7: each plane's blocks are standalone grayscale
    JPEG streams (plane-major offsets) — the last TIFF seam from VERDICT
    r6.  Lossy, so gate on PSNR, and pin that the planar and chunky-gray
    encodings of one plane decode identically (same stream bytes)."""
    rng = np.random.default_rng(12)
    sm = rng.integers(0, 255, (96, 80, 3)).astype("f8")
    for _ in range(3):  # smooth: JPEG-friendly content
        sm[1:-1, 1:-1] = (
            sm[:-2, 1:-1] + sm[2:, 1:-1] + sm[1:-1, :-2]
            + sm[1:-1, 2:] + sm[1:-1, 1:-1]
        ) / 5
    img = sm.clip(0, 255).astype(np.uint8)
    enc = tiff.encode(img, compression="jpeg", quality=95, planar=2)
    out, meta = tiff.read(enc)
    assert meta["planar"] == 2 and meta["compression"] == 7
    mse = ((out.astype("f8") - img) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) >= 38
    # plane-level determinism: planar plane 0 decodes exactly like the
    # same plane encoded as a chunky grayscale JPEG TIFF
    g, _ = tiff.read(tiff.encode_gray(img[:, :, 0], compression="jpeg", quality=95))
    assert np.array_equal(out[:, :, 0], np.squeeze(g))


def test_jpeg12_in_tiff_roundtrip_and_planar_multiband():
    """comp 7 at 12-bit precision (SOF1 extended sequential inside the
    blocks) — the precision real remote-sensing JPEG-in-TIFF archives
    use; the reference decodes it through libjpeg inside GeoTrellis's
    reader (ingest/.../LandsatInput.scala:23-27).  Striped + tiled +
    planar 4-band, PSNR-gated, BitsPerSample=12 surfaced, uint16 out."""
    rng = np.random.default_rng(13)
    xs = np.linspace(0, 3, 128)
    img12 = (
        2000 + 1800 * np.sin(np.outer(xs, xs)) + rng.normal(0, 8, (128, 128))
    ).clip(0, 4095).astype(np.uint16)

    def psnr(a, b):
        return 10 * np.log10(4095.0**2 / ((a.astype("f8") - b) ** 2).mean())

    for kw in (dict(), dict(tiled=True, tile=(64, 64))):
        enc = tiff.encode_gray(img12, compression="jpeg", quality=95, **kw)
        dec, meta = tiff.read(enc)
        assert meta["bits"] == 12 and meta["dtype"] == "uint16"
        assert psnr(np.squeeze(dec), img12) >= 55
    # planar 4-band 12-bit (each plane its own SOF1 stream)
    mb = np.stack([img12, img12 // 2, img12 // 3, img12 // 4], axis=-1)
    enc = tiff.encode(mb, compression="jpeg", quality=95, planar=2,
                      tiled=True, tile=(64, 64))
    dec, meta = tiff.read(enc)
    assert meta["bits"] == 12 and meta["planar"] == 2
    assert psnr(dec, mb) >= 55
    # >12-bit samples refuse (would silently wrap inside the codec)
    with pytest.raises(ValueError, match="4095"):
        tiff.encode_gray(np.full((8, 8), 5000, np.uint16), compression="jpeg")

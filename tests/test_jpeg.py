"""Pure-numpy baseline JPEG codec (core.jpeg) — the built-in foreign
image format.  Roundtrip PSNR gates, structural bitstream checks, the
honest NotImplementedError edges, and the multimodal-registry e2e path
with real decoded pixels."""

import numpy as np
import pytest

from geotrellis_landsat_emr_demo_spark.core import jpeg


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _smooth(h=50, w=70):
    yy, xx = np.mgrid[0:h, 0:w]
    return (127 + 120 * np.sin(yy / 7.0) * np.cos(xx / 9.0)).astype(np.uint8)


def test_gray_roundtrip_psnr_and_structure():
    img = _smooth()
    data = jpeg.encode_gray(img, 75)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = jpeg.decode(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert psnr(img, out) >= 40  # BASELINE.md lossy gate


def test_flat_image_is_lossless_and_tiny():
    img = np.full((32, 32), 128, np.uint8)
    data = jpeg.encode_gray(img)
    assert (jpeg.decode(data) == img).all()
    assert len(data) < 400  # DC-only blocks: headers dominate


def test_quality_monotone():
    img = _smooth()
    ps = [psnr(img, jpeg.decode(jpeg.encode_gray(img, q))) for q in (30, 60, 90)]
    assert ps[0] < ps[1] < ps[2]
    sizes = [len(jpeg.encode_gray(img, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_non_multiple_of_8_dims_and_noise():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (45, 61), np.uint8)  # worst case for DCT
    out = jpeg.decode(jpeg.encode_gray(img, 95))
    assert out.shape == (45, 61)
    assert psnr(img, out) >= 35


def test_rgb_444_roundtrip():
    yy, xx = np.mgrid[0:50, 0:70]
    rgb = np.stack(
        [
            (127 + 120 * np.sin(yy / 7.0)).astype(np.uint8),
            (127 + 120 * np.cos(xx / 9.0)).astype(np.uint8),
            ((yy * 2 + xx) % 256).astype(np.uint8),
        ],
        axis=-1,
    )
    out = jpeg.decode(jpeg.encode_rgb(rgb, 90))
    assert out.shape == rgb.shape
    assert psnr(rgb, out) >= 40


def test_progressive_gray_bit_identical_to_baseline():
    """The full progressive script (DC/AC spectral selection + successive
    approximation, incl. refinement scans) reconstructs the EXACT same
    quantized coefficients as the single baseline scan — decoded pixels
    are bit-identical."""
    for img in (_smooth(), np.random.default_rng(7).integers(0, 256, (41, 67), np.uint8)):
        for q in (50, 85, 95):
            prog = jpeg.decode(jpeg.encode_gray(img, q, progressive=True))
            base = jpeg.decode(jpeg.encode_gray(img, q))
            assert (prog == base).all()


def test_progressive_rgb_and_subsampled():
    rng = np.random.default_rng(9)
    g = _smooth(48, 70)
    rgb = np.stack([g, np.roll(g, 5, 0), np.roll(g, 9, 1)], axis=-1)
    for sub in ("444", "422", "420"):
        prog = jpeg.decode(jpeg.encode_rgb(rgb, 85, subsampling=sub, progressive=True))
        base = jpeg.decode(jpeg.encode_rgb(rgb, 85, subsampling=sub))
        assert (prog == base).all(), sub
    # noise stresses every run/EOB/refinement path
    nz = rng.integers(0, 256, (33, 49, 3), np.uint8)
    prog = jpeg.decode(jpeg.encode_rgb(nz, 92, subsampling="420", progressive=True))
    base = jpeg.decode(jpeg.encode_rgb(nz, 92, subsampling="420"))
    assert (prog == base).all()


def test_chroma_subsampling_baseline():
    """4:2:0 / 4:2:2 decode within the PSNR gate, incl. odd dimensions
    (partial MCUs on both axes)."""
    g = _smooth(50, 70)
    rgb = np.stack([g, np.roll(g, 3, 0), np.roll(g, 4, 1)], axis=-1)
    for sub, gate in (("444", 40), ("422", 35), ("420", 30)):
        out = jpeg.decode(jpeg.encode_rgb(rgb, 90, subsampling=sub))
        assert out.shape == rgb.shape
        assert psnr(rgb, out) >= gate, sub
    for h, w in ((17, 23), (16, 16), (15, 31), (8, 9)):
        img = np.stack([_smooth(h, w)] * 3, axis=-1)
        out = jpeg.decode(jpeg.encode_rgb(img, 90, subsampling="420"))
        assert out.shape == img.shape
        assert psnr(img, out) >= 30, (h, w)


def test_not_a_jpeg_rejected():
    # ValueError (not assert) so validation survives `python -O`
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode(b"\x89PNG\r\n")


def test_ff_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker; conforming external JPEGs use this and must still parse."""
    img = _smooth()
    data = jpeg.encode_gray(img, 90)
    i = data.find(b"\xff\xdb")  # pad before the first DQT marker
    assert i > 0
    padded = data[:i] + b"\xff" * 5 + data[i:]
    out = jpeg.decode(padded)
    assert out.shape == img.shape and psnr(img, out) >= 35


def test_multimodal_registry_e2e(spark):
    """A DataFrame of fmt='jpeg' binary images decodes through the default
    registry inside the Spark operator — real pixels, real stats."""
    import pandas as pd

    from geotrellis_landsat_emr_demo_spark.operators import multimodal

    imgs = {f"j{i}": _smooth(24 + 8 * i, 40) for i in range(3)}
    pdf = pd.DataFrame(
        [
            dict(image_id=k, bytes=jpeg.encode_gray(v, 85), fmt="jpeg")
            for k, v in imgs.items()
        ]
    )
    out = multimodal.decode_stats(spark.createDataFrame(pdf)).toPandas()
    assert set(out.image_id) == set(imgs)
    for r in out.itertuples(index=False):
        ref = imgs[r.image_id].astype(float)
        ref = ref[ref != 0]
        assert abs(r.mean - ref.mean()) < 3.0  # lossy but close


def test_edge_dimensions():
    """Degenerate sizes: 1x1, single row/col, exact block, block+1 — the
    pad-to-8/crop-back path must be exact about shapes."""
    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (1, 17), (9, 1), (8, 8), (9, 8), (7, 9)):
        img = rng.integers(0, 256, (h, w), np.uint8)
        out = jpeg.decode(jpeg.encode_gray(img, 95))
        assert out.shape == (h, w)
        assert psnr(img, out) >= 30

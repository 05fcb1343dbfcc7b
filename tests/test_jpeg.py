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


def test_progressive_raises():
    data = bytearray(jpeg.encode_gray(_smooth()))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode(bytes(data))


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

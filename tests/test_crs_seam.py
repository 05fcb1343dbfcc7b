"""Arbitrary-CRS seam (core/proj.py): resolver registry, proj4-string
conic families (Albers equal-area, Lambert conformal conic, generic
transverse Mercator), and end-to-end ingest of a non-UTM scene — the
engine's equivalent of the reference reprojecting whatever CRS a scene
GeoTIFF declares (LandsatInput.scala:72 via proj4)."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geotrellis_landsat_emr_demo_spark.catalog import Catalog
from geotrellis_landsat_emr_demo_spark.core import geom, kernels, proj, tiling
from geotrellis_landsat_emr_demo_spark.operators import ingest

from conftest import SCRATCH

AEA_CRS = "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0"
LCC_CRS = "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +x_0=100000 +y_0=50000"


def test_tmerc_proj4_equals_utm():
    """A '+proj=tmerc' string parameterized as UTM zone 11 is bitwise the
    closed-form UTM transform (same Krüger series, same constants)."""
    lng = np.array([-120.3, -119.2, -116.9])
    lat = np.array([35.1, 36.7, 34.2])
    e1, n1 = proj.lnglat_to_utm(lng, lat, 11, True)
    to_ll, from_ll = proj.resolve_crs(
        "+proj=tmerc +lon_0=-117 +k_0=0.9996 +x_0=500000 +y_0=0"
    )
    e2, n2 = from_ll(lng, lat)
    assert np.abs(e1 - e2).max() == 0.0
    assert np.abs(n1 - n2).max() == 0.0
    l2, p2 = to_ll(e2, n2)
    assert np.abs(l2 - lng).max() < 1e-8
    assert np.abs(p2 - lat).max() < 1e-8


@settings(max_examples=40, deadline=None)
@given(
    lng=st.floats(-125.0, -67.0, allow_nan=False),
    lat=st.floats(24.0, 49.0, allow_nan=False),
)
def test_aea_lcc_roundtrip_property(lng, lat):
    """Forward∘inverse identity to 1e-8 deg over CONUS for both conics,
    and the 3857 chain closes to mm."""
    for crs in (AEA_CRS, LCC_CRS):
        to_ll, from_ll = proj.resolve_crs(crs)
        x, y = from_ll(np.array([lng]), np.array([lat]))
        l2, p2 = to_ll(x, y)
        assert abs(float(l2[0]) - lng) < 1e-8
        assert abs(float(p2[0]) - lat) < 1e-8
        mx, my = proj.crs_to_mercator(x, y, crs)
        x2, y2 = proj.mercator_to_crs(mx, my, crs)
        assert abs(float(x2[0]) - float(x[0])) < 2e-3
        assert abs(float(y2[0]) - float(y[0])) < 2e-3


def test_aea_southern_aspect_and_area_invariant():
    """Southern-hemisphere standard parallels (negative cone constant)
    roundtrip; equal-area property: a 1-degree cell's projected area is
    within 0.1% of its authalic-sphere area."""
    crs = "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=134"
    to_ll, from_ll = proj.resolve_crs(crs)
    lng = np.array([133.0, 140.0, 146.5])
    lat = np.array([-25.0, -30.0, -41.0])
    x, y = from_ll(lng, lat)
    l2, p2 = to_ll(x, y)
    assert np.abs(l2 - lng).max() < 1e-8
    assert np.abs(p2 - lat).max() < 1e-8
    # area of the 1x1-deg quad centered at (134, -30), via the shoelace
    # of a densified projected boundary
    t = np.linspace(0.0, 1.0, 513)
    bx = np.concatenate([133.5 + t, np.full_like(t, 134.5), 134.5 - t, np.full_like(t, 133.5)])
    by = np.concatenate([np.full_like(t, -30.5), -30.5 + t, np.full_like(t, -29.5), -29.5 - t])
    qx, qy = from_ll(bx, by)
    area = 0.5 * abs(np.sum(qx * np.roll(qy, -1) - np.roll(qx, -1) * qy))
    # exact ellipsoidal band area via the authalic q (Snyder 3-12):
    # a^2/2 * |q(lat2) - q(lat1)| * dlam
    q1 = proj._q_auth(np.radians(-30.5))
    q2 = proj._q_auth(np.radians(-29.5))
    truth = (proj._A**2 / 2.0) * abs(q2 - q1) * (np.pi / 180.0)
    assert abs(area - truth) / truth < 1e-6


def test_register_crs_custom_resolver():
    """register_crs plugs in an unknown CRS; unknown strings raise with
    the accepted families named."""
    with pytest.raises(ValueError, match="register_crs"):
        proj.resolve_crs("ESRI:999999")

    def toy(crs):
        if crs != "TOY:1":
            return None
        # plate carrée at 1000 m/deg
        return (
            lambda x, y: (x / 1000.0, y / 1000.0),
            lambda lng, lat: (np.asarray(lng) * 1000.0, np.asarray(lat) * 1000.0),
        )

    proj.register_crs(toy)
    try:
        mx, my = proj.crs_to_mercator(np.array([10_000.0]), np.array([20_000.0]), "TOY:1")
        ex, ey = geom.lnglat_to_mercator(np.array([10.0]), np.array([20.0]))
        assert abs(float(mx[0] - ex[0])) < 1e-6 and abs(float(my[0] - ey[0])) < 1e-6
    finally:
        proj._RESOLVERS.remove(toy)
        proj._RESOLVED.clear()


# ----------------------------------------------------- e2e (Albers) ---

# ~100 km Albers-CRS extent over the central US
AEA_EXT = (-100_000.0, 1_500_000.0, 0.0, 1_600_000.0)


def _g(lng, lat):
    return 20000.0 + 10000.0 * np.sin(lng * 2.1) * np.cos(lat * 1.7)


def _aea_scene(px=256):
    x0, y0, x1, y1 = AEA_EXT
    xs = x0 + (np.arange(px) + 0.5) * (x1 - x0) / px
    ys = y1 - (np.arange(px) + 0.5) * (y1 - y0) / px
    X, Y = np.meshgrid(xs, ys)
    to_ll, _ = proj.resolve_crs(AEA_CRS)
    lng, lat = to_ll(X.ravel(), Y.ravel())
    return np.round(_g(lng, lat).reshape(px, px)).astype(np.uint16)[None]


def test_warp_albers_matches_analytic_truth():
    """Warped Albers pixels equal the analytic field at destination pixel
    centers (PSNR >= 40 dB — the same bar as the UTM warp test)."""
    scene = _aea_scene(px=512)
    env = proj.extent_to_mercator(AEA_EXT, AEA_CRS)
    w = (env[2] - env[0]) * 0.2
    dst = (env[0] + w, env[1] + w, env[2] - w, env[3] - w)
    warped = kernels.warp_to_extent(scene, AEA_EXT, AEA_CRS, dst, (256, 256))
    px = dst[0] + (np.arange(256) + 0.5) * (dst[2] - dst[0]) / 256
    py = dst[3] - (np.arange(256) + 0.5) * (dst[3] - dst[1]) / 256
    PX, PY = np.meshgrid(px, py)
    lng, lat = geom.mercator_to_lnglat(PX.ravel(), PY.ravel())
    truth = _g(lng, lat).reshape(256, 256)
    got = kernels.to_double(warped)[0]
    assert not np.isnan(got).any()
    psnr = 10 * np.log10(65535.0**2 / np.mean((got - truth) ** 2))
    assert psnr >= 40, f"PSNR {psnr:.1f} dB"


def test_ingest_albers_scene_e2e(spark):
    """Full ingest of a scene declaring a proj4 Albers CRS: committed
    tiles match the warp oracle bitwise — LandsatInput.scala:72 semantics
    for a CRS outside the UTM family."""
    root = os.path.join(SCRATCH, "aea-ingest")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    scene = _aea_scene(px=256)
    ts = pd.Timestamp("2015-06-01T00:00:00")
    pdf = pd.DataFrame(
        [
            dict(
                image_id="aea-0001",
                bytes=kernels.encode_payload(scene, "npy-u16"),
                w=256, h=256, fmt="npy-u16",
                caption="albers scene", phash=0, ts=ts,
                xmin=AEA_EXT[0], ymin=AEA_EXT[1],
                xmax=AEA_EXT[2], ymax=AEA_EXT[3],
                crs=AEA_CRS, nbands=1, cloud_cover=0.0,
            )
        ]
    )
    cat.append_pandas(pdf, "images")
    zoom = 10
    ingest.ingest_images(spark, cat, "aea", max_zoom=zoom, min_zoom=zoom)
    tiles = cat.read_pandas("tiles")
    assert len(tiles) >= 2
    for row in tiles.itertuples(index=False):
        oracle = kernels.warp_to_extent(
            scene, AEA_EXT, AEA_CRS, tiling.tile_extent(row.x, row.y, zoom), (256, 256)
        )
        got = kernels.decode_payload(row.tile)
        assert (got == oracle).all(), (row.x, row.y)

"""General raster reprojection: closed-form UTM (WGS84 transverse
Mercator) <-> lat/lng <-> Web Mercator, fully vectorized numpy.

The reference warps every scene from its native UTM zone to WebMercator
BEFORE tiling (ingest/src/main/scala/demo/etl/landsat/LandsatInput.scala:72,
with an explicit note that reprojecting per-chunk avoids NoData edge
artifacts).  This module supplies the projection math so the chunk kernel
can inverse-map destination (3857) pixel centers back into the source UTM
grid and bilinear-sample there — same semantics, no GDAL.

Formulas: Krüger flattening series for the transverse Mercator (standard
published form, exact to << 1 mm over a UTM zone); spherical Web Mercator
closed forms live in core.geom.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500_000.0  # false easting
_N0_SOUTH = 10_000_000.0

_N = _F / (2.0 - _F)  # third flattening n
# rectifying radius A = a/(1+n) * (1 + n^2/4 + n^4/64)
_AR = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity

# Krüger series coefficients (order n^3 — sub-mm over a zone)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)
_DELTA = (
    2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3,
    7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0,
    56.0 * _N**3 / 15.0,
)


def parse_utm_epsg(crs: str):
    """'EPSG:326zz'/'EPSG:327zz' -> (zone, is_north). Raises on non-UTM."""
    code = int(str(crs).upper().replace("EPSG:", ""))
    if 32601 <= code <= 32660:
        return code - 32600, True
    if 32701 <= code <= 32760:
        return code - 32700, False
    raise ValueError(f"not a UTM EPSG code: {crs}")


def utm_central_meridian_deg(zone: int) -> float:
    return -183.0 + 6.0 * zone


def lnglat_to_utm(lng_deg, lat_deg, zone: int, north: bool = True):
    """Vectorized WGS84 forward transverse Mercator -> (easting, northing)."""
    lam0 = np.radians(utm_central_meridian_deg(zone))
    phi = np.radians(np.asarray(lat_deg, dtype="f8"))
    lam = np.radians(np.asarray(lng_deg, dtype="f8")) - lam0
    s = np.sin(phi)
    # conformal latitude via t = sinh(atanh(sin) - e*atanh(e*sin))
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    easting = _E0 + _K0 * _AR * eta
    northing = _K0 * _AR * xi + (0.0 if north else _N0_SOUTH)
    return easting, northing


def utm_to_lnglat(easting, northing, zone: int, north: bool = True):
    """Vectorized inverse transverse Mercator -> (lng_deg, lat_deg)."""
    lam0 = np.radians(utm_central_meridian_deg(zone))
    xi = (np.asarray(northing, dtype="f8") - (0.0 if north else _N0_SOUTH)) / (
        _K0 * _AR
    )
    eta = (np.asarray(easting, dtype="f8") - _E0) / (_K0 * _AR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam + lam0), np.degrees(phi)


def mercator_to_crs(mx, my, crs: str):
    """EPSG:3857 coords -> coords in ``crs`` (3857 passthrough or UTM)."""
    from . import geom

    if str(crs).upper() in ("EPSG:3857", "3857"):
        return np.asarray(mx, dtype="f8"), np.asarray(my, dtype="f8")
    zone, north = parse_utm_epsg(crs)
    lng, lat = geom.mercator_to_lnglat(np.asarray(mx, "f8"), np.asarray(my, "f8"))
    return lnglat_to_utm(lng, lat, zone, north)


def crs_to_mercator(x, y, crs: str):
    """Coords in ``crs`` -> EPSG:3857."""
    from . import geom

    if str(crs).upper() in ("EPSG:3857", "3857"):
        return np.asarray(x, dtype="f8"), np.asarray(y, dtype="f8")
    zone, north = parse_utm_epsg(crs)
    lng, lat = utm_to_lnglat(np.asarray(x, "f8"), np.asarray(y, "f8"), zone, north)
    return geom.lnglat_to_mercator(lng, lat)


def extent_to_mercator(extent, crs: str, densify: int = 16):
    """Source-CRS extent -> its EPSG:3857 envelope, via a densified
    boundary (a projected rectangle's image is curved, so corners alone
    under-cover; 16 points/edge bounds the envelope error well below one
    pixel at Landsat scene scale)."""
    if str(crs).upper() in ("EPSG:3857", "3857"):
        return tuple(float(v) for v in extent)
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    t = np.linspace(0.0, 1.0, densify + 1)
    bx = np.concatenate(
        [xmin + (xmax - xmin) * t, np.full_like(t, xmax),
         xmax - (xmax - xmin) * t, np.full_like(t, xmin)]
    )
    by = np.concatenate(
        [np.full_like(t, ymin), ymin + (ymax - ymin) * t,
         np.full_like(t, ymax), ymax - (ymax - ymin) * t]
    )
    mx, my = crs_to_mercator(bx, by, crs)
    return float(mx.min()), float(my.min()), float(mx.max()), float(my.max())


def extents_to_mercator(xmin, ymin, xmax, ymax, crs: str, densify: int = 16):
    """Vectorized :func:`extent_to_mercator` over n same-CRS extents:
    four (n,) arrays in, four (n,) arrays out.  The densified boundary of
    every extent is built as one (n, 4*(densify+1)) block and projected
    in a single vectorized transform — no per-extent Python."""
    xmin = np.atleast_1d(np.asarray(xmin, dtype="f8"))
    ymin = np.atleast_1d(np.asarray(ymin, dtype="f8"))
    xmax = np.atleast_1d(np.asarray(xmax, dtype="f8"))
    ymax = np.atleast_1d(np.asarray(ymax, dtype="f8"))
    if str(crs).upper() in ("EPSG:3857", "3857"):
        return xmin, ymin, xmax, ymax
    t = np.linspace(0.0, 1.0, densify + 1)  # (d,)
    d = t.size
    w, h = (xmax - xmin)[:, None], (ymax - ymin)[:, None]
    rep = lambda v: np.repeat(v[:, None], d, axis=1)  # noqa: E731
    bx = np.concatenate(
        [xmin[:, None] + w * t, rep(xmax), xmax[:, None] - w * t, rep(xmin)],
        axis=1,
    )
    by = np.concatenate(
        [rep(ymin), ymin[:, None] + h * t, rep(ymax), ymax[:, None] - h * t],
        axis=1,
    )
    mx, my = crs_to_mercator(bx.ravel(), by.ravel(), crs)
    mx, my = mx.reshape(bx.shape), my.reshape(by.shape)
    return mx.min(axis=1), my.min(axis=1), mx.max(axis=1), my.max(axis=1)

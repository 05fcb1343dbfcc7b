"""HTTP route parity: live stdlib server vs direct LayerService calls."""

import json
import urllib.request

import pytest

from geotrellis_landsat_emr_demo_spark import fixtures, server

T1 = "2015-07-01T00:00:00Z"
T2 = "2015-09-01T00:00:00Z"


@pytest.fixture(scope="module")
def srv(tsmall_catalog):
    httpd, port = server.serve(tsmall_catalog)
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read(), r.headers.get("Content-Type")


def _post(url, body):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_catalog_route(srv, svc):
    body, ctype = _get(f"{srv}/catalog")
    assert ctype == "application/json"
    assert json.loads(body) == svc.catalog()


def test_tile_routes(srv, svc, tsmall_catalog):
    pdf = tsmall_catalog.read_pandas("tiles", columns=["zoom", "x", "y", "n_frags"])
    leaf = pdf[pdf.zoom == 13]
    hot = leaf[leaf.n_frags == leaf.n_frags.max()].iloc[0]
    x, y = int(hot.x), int(hot.y)
    t1q = T1.replace(":", "%3A")
    body, ctype = _get(f"{srv}/tiles/landsat/13/{x}/{y}?time={t1q}&operation=ndvi")
    assert ctype == "image/png"
    assert body == svc.render_tile("landsat", 13, x, y, T1, "ndvi")
    # missing tile -> 200 empty body (ReaderSet.scala:76-79 parity)
    body, _ = _get(f"{srv}/tiles/landsat/13/1/1?time={t1q}")
    assert body == b""
    # diff
    t2q = T2.replace(":", "%3A")
    body, _ = _get(
        f"{srv}/diff/landsat/13/{x}/{y}?time1={t1q}&time2={t2q}&operation=ndvi"
    )
    assert body == svc.render_diff("landsat", 13, x, y, T1, T2, "ndvi")


def test_mean_and_series_routes(srv, svc):
    aoi = fixtures.aoi_pdf("t-small")
    t1q = T1.replace(":", "%3A")
    got = _post(f"{srv}/mean/landsat/ndvi?time={t1q}", aoi.iloc[4].geojson)
    expect = svc.polygonal_mean("landsat", "ndvi", aoi.iloc[4].geojson, T1)
    assert abs(got["answer"] - expect) < 1e-12
    # disjoint AOI -> NaN -> JSON null
    got = _post(f"{srv}/mean/landsat/ndvi?time={t1q}", aoi.iloc[5].geojson)
    assert got["answer"] is None
    pts = fixtures.query_points_pdf("t-small")
    p = pts.iloc[0]
    got = _get(f"{srv}/series/landsat/ndvi?lat={p.lat}&lng={p.lng}")[0]
    ans = json.loads(got)["answer"]
    expect = svc.time_series("landsat", "ndvi", p.lat, p.lng)
    assert [(a, round(b, 12)) for a, b in expect] == [
        (a, round(b, 12)) for a, b in ans
    ]


def test_readall_route(srv, svc):
    got = json.loads(_get(f"{srv}/readall/landsat")[0])
    assert got["count"] == svc.read_all_count("landsat")


def test_point_read_tile_cache(tsmall_catalog):
    """S3 local-cache analog: a repeat point read of the same tile must not
    touch the parquet scan again (and invalidates on a new snapshot)."""
    from geotrellis_landsat_emr_demo_spark.plans.queries import LayerService

    s = LayerService(tsmall_catalog)
    pdf = tsmall_catalog.read_pandas("tiles", columns=["zoom", "x", "y", "ts"])
    row = pdf[pdf.zoom == 13].iloc[0]
    millis = int(row.ts.value // 1_000_000)
    calls = {"n": 0}
    orig = tsmall_catalog.read_arrow

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    tsmall_catalog.read_arrow = counting
    try:
        t1 = s._point_read("landsat", 13, int(row.x), int(row.y), millis)
        n_after_first = calls["n"]
        t2 = s._point_read("landsat", 13, int(row.x), int(row.y), millis)
        assert calls["n"] == n_after_first  # served from the tile cache
        assert (t1 == t2).all()
        # missing keys cache too (the empty-PNG hot path)
        assert s._point_read("landsat", 13, 0, 0, millis) is None
        assert s._point_read("landsat", 13, 0, 0, millis) is None
    finally:
        tsmall_catalog.read_arrow = orig


def test_readall_bench_dual_path(spark, tsmall_catalog, svc):
    """A6 dual path: the Spark-job count and the collection count agree
    (Router.scala:224-264's obj_rdd == obj_collection invariant)."""
    from geotrellis_landsat_emr_demo_spark.plans.queries import LayerService

    s = LayerService(tsmall_catalog, spark=spark)
    rows = s.read_all_bench("landsat", 13, reps=2)
    assert len(rows) == 2
    for r in rows:
        assert r["obj_rdd"] == r["obj_collection"] == svc.read_all_count("landsat")
        assert "time_rdd" in r and "time_collection" in r
    # Spark-free service still serves the collection path
    rows2 = svc.read_all_bench("landsat", 13, reps=1)
    assert rows2[0]["obj_collection"] == svc.read_all_count("landsat")
    assert "obj_rdd" not in rows2[0]

#!/usr/bin/env python
"""End-to-end demo: synthesize -> ingest -> serve -> query over HTTP.

Mirrors the reference's README walkthrough (local ingest with --limit 1,
then curl localhost:8899/catalog and browse tiles — README.md:86-166):

    python tools/demo.py [--keep]

Ingests the t-small corpus into .scratch/demo, starts the HTTP layer, and
exercises every route, printing responses/sizes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", action="store_true", help="keep the catalog dir")
    args = ap.parse_args()

    from geotrellis_landsat_emr_demo_spark import fixtures, server
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest
    from geotrellis_landsat_emr_demo_spark.session import build_session

    root = os.path.join(REPO, ".scratch", "demo")
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    if not cat.files("images"):
        print("== synthesizing t-small corpus + ingesting (zooms 13..10)")
        spark = build_session(master="local[8]", shuffle_partitions=8)
        fixtures.write_all(cat, "t-small")
        m = ingest.ingest_images(spark, cat, "landsat", max_zoom=13, min_zoom=10)
        for k, v in m.items():
            print(f"   {k}: {v}")
        spark.stop()

    httpd, port = server.serve(cat)
    base = f"http://127.0.0.1:{port}"
    print(f"== serving on {base}")

    def get(path):
        with urllib.request.urlopen(base + path, timeout=60) as r:
            return r.read(), r.headers.get("Content-Type")

    body, _ = get("/catalog")
    catalog = json.loads(body)
    print("== /catalog ->", json.dumps(catalog, indent=1)[:400])
    layer = catalog["layers"][0]
    t = layer["times"][0].replace("-0400", "-0400")  # reference UTC-4 format

    tiles = cat.read_pandas("tiles", columns=["zoom", "x", "y", "ts", "n_frags"])
    hot = tiles[tiles.zoom == 13].sort_values("n_frags").iloc[-1]
    tiso = hot.ts.strftime("%Y-%m-%dT%H:%M:%SZ").replace(":", "%3A")
    for op in ("", "&operation=ndvi", "&operation=ndwi"):
        png, ctype = get(f"/tiles/landsat/13/{int(hot.x)}/{int(hot.y)}?time={tiso}{op}")
        out = os.path.join(root, f"tile{op.replace('&operation=', '_') or '_rgb'}.png")
        open(out, "wb").write(png)
        print(f"== /tiles ({op or 'rgb'}) -> {len(png)} bytes {ctype} -> {out}")

    aoi = fixtures.aoi_pdf("t-small")
    req = urllib.request.Request(
        f"{base}/mean/landsat/ndvi?time={tiso}",
        data=aoi.iloc[4].geojson.encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        print("== /mean (hot-cell AOI) ->", r.read().decode())

    pts = fixtures.query_points_pdf("t-small")
    body, _ = get(f"/series/landsat/ndvi?lat={pts.iloc[0].lat}&lng={pts.iloc[0].lng}")
    print("== /series ->", body.decode())
    body, _ = get("/readall/landsat")
    print("== /readall ->", body.decode())
    body, _ = get("/readall/landsat/13")
    bench = json.loads(body)["result"]
    print(
        "== /readall/13 (dual-path probe) -> "
        f"{len(bench)} reps, obj_collection={bench[0]['obj_collection']}, "
        f"time_collection_ms={bench[0]['time_collection']}"
    )
    httpd.shutdown()
    print("== demo complete")


if __name__ == "__main__":
    main()

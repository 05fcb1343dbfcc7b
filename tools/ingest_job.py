#!/usr/bin/env python
"""spark-submit entry point for the ingest job (north_rule: run via
``spark-submit --py-files`` on a multi-executor cluster).

Usage (cluster):
    python tools/make_pyfiles.py                       # builds dist/engine.zip
    spark-submit --master yarn --deploy-mode client \\
        --py-files dist/engine.zip \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        tools/ingest_job.py --catalog s3://bucket/warehouse --layer landsat

Usage (local smoke, what CI runs):
    spark-submit --master 'local[8]' --py-files dist/engine.zip \\
        tools/ingest_job.py --catalog /tmp/wh --layer landsat \\
        --synthesize t-small --min-zoom 11

The job is resumable: rerunning with the same catalog skips committed
stages (per-stage markers + lineage, operators/ingest.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="catalog root directory")
    ap.add_argument("--layer", default="landsat")
    ap.add_argument("--max-zoom", type=int, default=13)
    ap.add_argument("--min-zoom", type=int, default=1)
    ap.add_argument("--salt-buckets", type=int, default=1)
    ap.add_argument(
        "--synthesize",
        default=None,
        help="generate a synthetic images table first (t-small | t-bench)",
    )
    ap.add_argument("--scenes", type=int, default=None)
    args = ap.parse_args()

    # on spark-submit the session already exists; builder.getOrCreate attaches
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    cat = Catalog(args.catalog)
    if args.synthesize and not cat.files("images"):
        kw = {"n_scenes": args.scenes} if args.scenes else {}
        cat.append_pandas(fixtures.images_pdf(args.synthesize, **kw), "images")

    t0 = time.time()
    metrics = ingest.ingest_images(
        spark,
        cat,
        args.layer,
        max_zoom=args.max_zoom,
        min_zoom=args.min_zoom,
        salt_buckets=args.salt_buckets,
    )
    wall = time.time() - t0
    tiles = sum(m.get("rows", 0) for m in metrics.values())
    print(
        json.dumps(
            dict(
                layer=args.layer,
                tiles=tiles,
                wall_s=round(wall, 2),
                tiles_per_sec=round(tiles / wall, 2) if wall else None,
                stages={k: v for k, v in metrics.items()},
            )
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

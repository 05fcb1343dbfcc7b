#!/usr/bin/env python
"""Interleaved A/B of ingest configurations at one pinned level — the
only decision-grade instrument on this box (single samples flip by 2x
run-to-run; see BENCH/BASELINE.md caveats).

AB_CONFIGS: JSON list of ingest_images kwarg dicts.  One JVM, one
warmup ingest, then reps alternating through the configs; per-config
walls + medians printed."""
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import _pin, build  # noqa: E402


def one(spark, cat_root_tag, scenes, px, kw):
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    root = os.path.join(REPO, ".bench_data", f"ab-{cat_root_tag}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.append_pandas(fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images")
    t0 = time.time()
    ingest.ingest_images(spark, cat, "bench", max_zoom=13, min_zoom=10, **kw)
    wall = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    return wall


def main():
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    scenes = int(os.environ.get("SCALE_SCENES", "384"))
    px = int(os.environ.get("SCALE_PX", "768"))
    reps = int(os.environ.get("AB_REPS", "3"))
    configs = json.loads(os.environ.get("AB_CONFIGS", '[{}]'))
    _pin(cpus)
    spark = build(cpus)
    one(spark, "warm", scenes, px, configs[0])  # shared warmup
    walls = [[] for _ in configs]
    for rep in range(reps):
        for i, kw in enumerate(configs):
            walls[i].append(round(one(spark, f"c{i}", scenes, px, kw), 1))
            print(f"# rep{rep} cfg{i} {kw} -> {walls[i][-1]}", flush=True)
    _pin(None)
    spark.stop()
    print(json.dumps(dict(
        cpus=cpus,
        configs=configs,
        walls=walls,
        medians=[round(statistics.median(w), 1) for w in walls],
    )))


if __name__ == "__main__":
    main()

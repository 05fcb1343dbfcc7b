#!/usr/bin/env python
"""One warm, pinned ingest measurement at a single parallelism level —
the bisect probe for n32 anomalies.  Usage: PROBE_CPUS=32 python
tools/warm_n32_probe.py (run from any worktree; uses that tree's code)."""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import _pin, build  # noqa: E402


KW = json.loads(os.environ.get("PROBE_KW", "{}"))


def one(spark, cpus, scenes, px, tag):
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    root = os.path.join(REPO, ".bench_data", f"probe-{cpus}-{tag}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.append_pandas(fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images")
    t0 = time.time()
    m = ingest.ingest_images(spark, cat, "bench", max_zoom=13, min_zoom=10, **KW)
    wall = time.time() - t0
    stages = {k.split(":")[-1]: round(v.get("wall_s", 0), 1) for k, v in m.items()}
    shutil.rmtree(root, ignore_errors=True)
    return wall, stages


def main():
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    scenes = int(os.environ.get("SCALE_SCENES", "384"))
    px = int(os.environ.get("SCALE_PX", "768"))
    _pin(cpus)
    spark = build(cpus)
    w0, _ = one(spark, cpus, scenes, px, "warm")
    w1, st = one(spark, cpus, scenes, px, "meas")
    _pin(None)
    spark.stop()
    print(json.dumps(dict(repo=REPO, cpus=cpus, cold=round(w0, 1),
                          warm=round(w1, 1), stages=st, kw=KW)))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-stage ingest profiling at two pinned parallelism levels.

Round-6 instrument for the write-side scaling gap: runs the SAME
384-scene ingest as tools/bench_scaling.py at local[8] and local[32]
(affinity-pinned like the scaling protocol) and prints the per-stage
wall breakdown (leaf merge, each pyramid level, attrs) plus catalog
bytes written — so the n32 concentration is attributed to a stage, not
guessed."""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import _pin, build  # noqa: E402


def run(cpus: int, scenes: int, px: int, tag: str, **ingest_kw):
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    data_root = os.environ.get("SCALE_DATA_ROOT", os.path.join(REPO, ".bench_data"))
    root = os.path.join(data_root, f"prof-{cpus}-{tag}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.append_pandas(fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images")
    spark = build(cpus)
    try:
        _pin(cpus)
        # warm pass (separate catalog) once per level is too slow; rely on
        # build()'s python-worker warmup and report rep walls
        t0 = time.time()
        m = ingest.ingest_images(spark, cat, "bench", max_zoom=13, min_zoom=10, **ingest_kw)
        wall = time.time() - t0
    finally:
        _pin(None)
        spark.stop()
    stages = {k: round(v.get("wall_s", 0), 2) for k, v in m.items()}
    nbytes = sum(v.get("bytes", 0) for v in m.values())
    tiles = sum(v.get("rows", 0) for v in m.values())
    out = dict(cpus=cpus, wall=round(wall, 2), tiles=tiles,
               mb_written=round(nbytes / 1e6, 1), stages=stages, kw=str(ingest_kw))
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    scenes = int(os.environ.get("SCALE_SCENES", "384"))
    px = int(os.environ.get("SCALE_PX", "768"))
    kw = json.loads(os.environ.get("PROF_KW", "{}"))
    levels = [int(v) for v in os.environ.get("PROF_LEVELS", "8,32,8,32").split(",")]
    outs = [run(c, scenes, px, f"{i}", **kw) for i, c in enumerate(levels)]
    by = {}
    for o in outs:
        by.setdefault(o["cpus"], []).append(o["wall"])
    if 8 in by and 32 in by:
        t8, t32 = min(by[8]), min(by[32])
        print(json.dumps({"t8": t8, "t32": t32, "eff": round(t8 / (4 * t32), 3)}))

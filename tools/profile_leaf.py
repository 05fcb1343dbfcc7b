#!/usr/bin/env python
"""Slice the z13 leaf stage into cumulative plan prefixes and time each:
  read        images scan -> noop
  repart      + round-robin repartition -> noop
  chunk       + chunk_premerge mapInPandas -> noop
  merge       + groupBy.applyInPandas final merge -> noop
  write       full leaf incl. staged parquet write + commit
Run at one pinned level (PROF_CPUS)."""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tools.bench_scaling import _pin, build  # noqa: E402


def main():
    cpus = int(os.environ.get("PROF_CPUS", "8"))
    scenes = int(os.environ.get("SCALE_SCENES", "96"))
    px = int(os.environ.get("SCALE_PX", "768"))
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    root = os.path.join(REPO, ".bench_data", f"leafprof-{cpus}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.append_pandas(fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images")
    _pin(cpus)
    spark = build(cpus)
    par = spark.sparkContext.defaultParallelism

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"cpus": cpus, "scenes": scenes}
    cols = ["image_id", "bytes", "ts", "xmin", "ymin", "xmax", "ymax", "caption", "crs"]
    plans = {}
    plans["read"] = lambda: cat.read_spark(spark, "images").select(*cols)
    plans["repart"] = lambda: plans["read"]().repartition(par)
    plans["chunk"] = lambda: plans["repart"]().mapInPandas(
        ingest._chunk_premerge_fn(13), schema=ingest._PARTIAL_SCHEMA
    )
    plans["merge"] = lambda: ingest._merge_partials(plans["chunk"](), "p", 13, "npy-u16")
    for name in ("read", "repart", "chunk", "merge"):
        for rep in range(2):
            t0 = time.time()
            noop(plans[name]())
            out[name] = round(time.time() - t0, 2)  # keep warm rep
    # full leaf with real write+commit
    for rep in range(2):
        shutil.rmtree(os.path.join(root, "tiles"), ignore_errors=True)
        m = cat._read_manifest()
        m["tables"].pop("tiles", None); m["committed"] = {}
        cat._write_manifest(m)
        t0 = time.time()
        ingest.ingest_images(spark, cat, "p", max_zoom=13, min_zoom=13)
        out["write"] = round(time.time() - t0, 2)
    _pin(None)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

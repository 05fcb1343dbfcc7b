#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the image-ingest
micro-benchmark on the synthetic t-bench corpus, and prints ONE JSON line:

  {"metric": "...", "value": <total-sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "extras": {...}}

Methodology: per query 1 cold rep + best-of-2 warm (caches dropped
between reps); "queries" carries the warm best, extras.queries_cold the
cold rep — single cold samples on this shared box landed 3-14x above
isolated re-runs (round-3 adjudication), so the gate number is warm.

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N) is produced
by tools/bench_scaling.py, which runs the same ingest at local[8] and
local[32] and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cell_assign_agg",
    "pyramid_rollup",
    "envelope_pip_join",
    "knn_points",
    "spacetime_key_agg",
    "merge_first_wins",
    "zonal_group_mean",
    "window_series",
    "dedup_exact",
    "dedup_minhash_bands",
    "ngram_jaccard",
    "dedup_components",
    "quality_score",
    "embedding_knn",
    "embedding_near_dups",
    "window_tumbling_counts",
    "sessionize",
    "minhash_lsh_pairs",
    "ann_lsh_topk",
    "simhash_near_pairs",
    "embedding_lsh_near_dups",
    "embedding_ivf_topk",
    "kmeans_assign",
    # round-4 pipeline stages
    "pii_scrub",
    "paragraph_dedup",
    "stratified_sample",
    "corpus_profile",
]


def materialize(df) -> int:
    """Force full execution without driver collection (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def ingest_bench(spark, scenes: int = 24, px: int = 512) -> dict:
    """Synthetic image ingest: scenes -> zoom-13 leaves + pyramid to z9,
    plus the serving-path probe (the reference's readall micro-benchmark,
    server/.../Router.scala:237-258): pruned point reads + tile renders.
    Reports tiles/sec ingest + renders/sec serving."""
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest
    from geotrellis_landsat_emr_demo_spark.plans.queries import LayerService

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_data", f"ingest-{CPUS}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.append_pandas(
        fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images"
    )
    t0 = time.time()
    metrics = ingest.ingest_images(spark, cat, "bench", max_zoom=13, min_zoom=9)
    wall = time.time() - t0
    tiles = sum(m.get("rows", 0) for m in metrics.values())

    # serving probe: render every zoom-13 tile once via the no-Spark path
    svc = LayerService(cat)
    keys = cat.read_pandas("tiles", columns=["zoom", "x", "y", "ts"])
    leaf = keys[keys.zoom == 13]
    t0 = time.time()
    n = 0
    for row in leaf.itertuples(index=False):
        tiso = row.ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        png = svc.render_tile("bench", 13, int(row.x), int(row.y), tiso, "ndvi")
        assert png
        n += 1
    serve_wall = time.time() - t0
    count = svc.read_all_count("bench")

    shutil.rmtree(root, ignore_errors=True)
    return dict(
        tiles=tiles,
        wall_s=round(wall, 3),
        tiles_per_sec=round(tiles / wall, 2),
        renders=n,
        renders_per_sec=round(n / serve_wall, 2),
        readall=count,
    )


def skew_merge_bench(spark, hot_scenes: int = 96, px: int = 256, reps: int = 3) -> dict:
    """Forced-skew merge row: 8 spread scenes + ``hot_scenes`` stacked on
    ONE footprint/timestamp (a hot cell with ~100 overlapping
    contributors), leaf stage only, combiner-only vs auto-salted —
    exercises the salt_buckets path the equivalence tests prove but the
    headline ingest (uniform coverage) never stresses.

    Decision-grade per the repo's own protocol (BENCH/BASELINE.md §r05):
    ``reps`` INTERLEAVED samples per config (combiner, salted, combiner,
    salted, ...) with per-rep walls + the median — single samples flip
    run-to-run on this shared box."""
    import statistics

    import pandas as pd

    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    base = fixtures.images_pdf("t-bench", n_scenes=8, px=px)
    hot = base.iloc[[0] * hot_scenes].copy().reset_index(drop=True)
    hot["image_id"] = [f"hot-{i:04d}" for i in range(hot_scenes)]
    pdf = pd.concat([base, hot], ignore_index=True)
    out = {"hot_scenes": hot_scenes, "reps": reps}
    # combiner-only vs salted (auto rule: B ~ sqrt(post-combiner fan-in)
    # once it reaches _SALT_TARGET; at this corpus eff=32 -> salted)
    configs = (("combiner", 1), ("salted4", 4))
    walls = {label: [] for label, _ in configs}
    for rep in range(reps):
        for label, salt in configs:  # interleave within each rep
            root = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".bench_data",
                f"skew-{label}",
            )
            shutil.rmtree(root, ignore_errors=True)
            cat = Catalog(root)
            cat.append_pandas(pdf, "images")
            t0 = time.time()
            m = ingest.ingest_images(
                spark, cat, "skew", max_zoom=13, min_zoom=13, salt_buckets=salt
            )
            walls[label].append(round(time.time() - t0, 3))
            out.setdefault("tiles", sum(v.get("rows", 0) for v in m.values()))
            shutil.rmtree(root, ignore_errors=True)
    for label, _ in configs:
        out[f"{label}_reps_s"] = walls[label]
        out[f"{label}_s"] = round(statistics.median(walls[label]), 3)
    out["auto_buckets"] = ingest._auto_salt_buckets(
        spark.createDataFrame(pdf), 13, spark.sparkContext.defaultParallelism
    )
    return out


def ivf_trained_bench(spark, sf_dir: str, k: int = 10) -> dict:
    """IVF recall@k vs probe cost, trained vs seeded quantizer, on TWO
    corpora (the r5 flat-recall adjudication, BENCH/BASELINE.md §ivf):

    - the driver's embeddings.parquet is ISOTROPIC — flat PCA spectrum,
      top-1 cosine ~0.4 vs random 0.0±0.13 — so true neighbors spread
      ~uniformly over Voronoi cells and ANY nlist=16 quantizer's recall
      is ~the probed-cell fraction; training buys nothing BY GEOMETRY
      (0.306 both at nprobe=2 was correct behavior, not a bug);
    - the clustered fixture (fixtures.embeddings_clustered_pdf) is the
      geometry IVF exists for: trained lists align with the mixture and
      recall-per-probe jumps ~2.3x over seeded at the same candidate
      fraction.

    Reports recall at nprobe 1/2/4/8 per (corpus, quantizer) + warm
    latency at the headline nprobe=2."""
    from pyspark.sql import functions as F

    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.operators import similarity

    out = {}
    corpora = {
        "isotropic": spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        "clustered": spark.createDataFrame(fixtures.embeddings_clustered_pdf()),
    }
    for cname, emb in corpora.items():
        queries = emb.filter(F.col("vec_id") < 32)

        def topset(df):
            res = {}
            for r in df.collect():
                res.setdefault(r.query_id, set()).add(r.neighbor_id)
            return res

        truth = topset(similarity.cosine_topk(emb, queries, k=k))

        t0 = time.time()
        cents, _, hist = similarity.kmeans_fit(emb, k=16, iters=5)
        out[f"{cname}_train_s"] = round(time.time() - t0, 3)
        out[f"{cname}_kmeans_obj"] = round(hist[-1], 4)
        for label, c in (("seeded", None), ("trained", cents)):
            recs = {}
            for nprobe in (1, 2, 4, 8):
                t0 = time.time()
                got = topset(
                    similarity.ivf_topk(
                        emb, queries, k=k, n_centroids=16, nprobe=nprobe, centroids=c
                    )
                )
                wall = time.time() - t0
                recs[nprobe] = round(
                    sum(
                        len(got.get(q, set()) & truth[q]) / len(truth[q])
                        for q in truth
                    )
                    / len(truth),
                    4,
                )
                if nprobe == 2:
                    out[f"{cname}_{label}_warm_s"] = round(wall, 3)
            out[f"{cname}_{label}_recall@nprobe"] = recs
    return out


def cog_scan_bench(spark, scenes: int = 48, px: int = 1024) -> dict:
    """COG archive source row: AOI-windowed scan vs whole-archive scan.

    The claim under test is the 100 TB access pattern (SURVEY §2.1 S11):
    an AOI query over a COG archive costs header reads + only the
    intersecting tile ranges, not the archive.  Reports the measured
    bytes-read fraction alongside the walls."""
    from pyspark.sql import functions as F

    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.core import cog, tiling
    from geotrellis_landsat_emr_demo_spark.sources import cog as cogsrc

    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_data", f"cogs-{scenes}-{px}"
    )
    marker = os.path.join(root, "_done")
    specs = fixtures.scene_specs("t-bench", n_scenes=scenes, px=px)
    if not os.path.exists(marker):  # deterministic; built once, reused
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        for spec in specs:
            arr = fixtures.scene_array(spec)
            sx = (spec["xmax"] - spec["xmin"]) / arr.shape[2]
            sy = (spec["ymax"] - spec["ymin"]) / arr.shape[1]
            epsg = int(spec["crs"].split(":")[1])
            data = cog.write_cog(
                arr.transpose(1, 2, 0),
                geo=dict(
                    pixel_scale=(sx, sy),
                    tiepoint=(0, 0, 0, spec["xmin"], spec["ymax"], 0),
                    epsg=epsg,
                ),
                tile=(256, 256),
            )
            with open(os.path.join(root, f"{spec['image_id']}.tif"), "wb") as f:
                f.write(data)
        open(marker, "w").write("ok")
    paths = sorted(
        os.path.join(root, f) for f in os.listdir(root) if f.endswith(".tif")
    )

    t0 = time.time()
    inv = cogsrc.cog_inventory(spark, paths).cache()
    n_files = inv.count()
    inventory_s = time.time() - t0

    # AOI = one zoom-13 tile footprint at the fixture center (every scene
    # overlaps it; windows are small fractions of every file)
    cx, cy = fixtures.center_mercator()
    span = tiling.tile_span(13)
    aoi = (cx - span / 2, cy - span / 2, cx + span / 2, cy + span / 2)
    out = {"files": n_files, "inventory_s": round(inventory_s, 3)}
    for label, kwargs in (
        ("aoi", dict(aoi=aoi)),
        ("aoi_overview", dict(aoi=aoi, resolution=4 * span / 256)),
        ("full", dict()),
    ):
        wall = rows = None
        for rep in range(2):  # cold + warm; report warm
            t0 = time.time()
            agg = (
                cogsrc.cog_scenes(spark, inv, **kwargs)
                .groupBy()
                .agg(
                    F.count("*").alias("n"),
                    F.sum("bytes_read").alias("br"),
                    F.sum("file_bytes").alias("fb"),
                )
                .collect()[0]
            )
            wall, rows = time.time() - t0, agg["n"]
        out[f"{label}_s"] = round(wall, 3)
        out[f"{label}_scenes"] = rows
        out[f"{label}_read_frac"] = round(
            (agg["br"] or 0) / max(1, agg["fb"] or 0), 4
        )
    inv.unpersist()
    return out


def main():
    os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
    from geotrellis_landsat_emr_demo_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entry.queries()

    # warm the JVM and all python workers once (fork + pandas import);
    # excluded from timings like a long-lived cluster's startup
    def _noop(it):
        for b in it:
            yield b

    spark.range(CPUS * 4, numPartitions=CPUS * 4).mapInPandas(_noop, "id long").count()

    def _drop_caches():
        """Free persisted/localCheckpoint blocks between queries.  Several
        operators materialize their signature/bucket relations (the
        exchange-reuse workaround); each query pays that cost inside its
        own timed window, but blocks lingering across 21 queries squeeze
        execution memory and inflate later timings by 5-20x (measured:
        embedding_near_dups 35 s in-session vs 1.3-7 s isolated)."""
        import gc

        gc.collect()  # release py4j refs so the RDDs below are the full set
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        spark.catalog.clearCache()

    # Per query: one COLD rep (page cache / JIT / codegen for this plan
    # all cold) then best-of-2 WARM reps.  The gate number is the warm
    # best — the box's bimodal memory/disk-contention spikes made single
    # samples land 3-14x above isolated re-runs in round 3, which made the
    # bench useless for regression detection; cold times are still
    # reported (extras.queries_cold) for the full picture.  Caches are
    # dropped between reps, so a rep never rides another's blocks — warm
    # here means OS page cache + JVM warmth, not Spark-cached data.
    timings, cold = {}, {}
    for name in HEADLINE:
        reps = []
        for rep in range(3):
            t0 = time.time()
            materialize(qs[name](spark, SF_DIR))
            reps.append(round(time.time() - t0, 3))
            _drop_caches()
        cold[name] = reps[0]
        timings[name] = min(reps[1:])

    extras = {"ingest": ingest_bench(spark), "cpus": CPUS, "queries_cold": cold}
    extras["skew_merge"] = skew_merge_bench(spark)
    extras["ivf_trained"] = ivf_trained_bench(spark, SF_DIR)
    extras["cog_scan"] = cog_scan_bench(spark)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = SF_DIR
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extras": extras,
    }
    # Full result (with every extras table) goes to a FILE; stdout gets a
    # compact single line.  Round 5's stdout JSON outgrew the driver's
    # tail capture and BENCH_r05.json recorded `parsed: null`, losing the
    # warm headline numbers — the artifact channel must never depend on
    # extras growth (VERDICT r5 task 2).
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    ing = extras.get("ingest", {})
    slim = dict(full)
    slim["extras"] = {
        "ingest_tiles_per_sec": ing.get("tiles_per_sec"),
        "renders_per_sec": ing.get("renders_per_sec"),
        "full_results": "BENCH/last_run.json",
    }
    print(json.dumps(slim))
    spark.stop()


if __name__ == "__main__":
    main()

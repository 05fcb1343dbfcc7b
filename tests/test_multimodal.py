"""Multimodal binary-column plumbing + streaming/incremental ingest."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_landsat_emr_demo_spark import fixtures
from geotrellis_landsat_emr_demo_spark.catalog import Catalog
from geotrellis_landsat_emr_demo_spark.core import kernels as K
from geotrellis_landsat_emr_demo_spark.operators import multimodal

from conftest import SCRATCH


@pytest.fixture(scope="module")
def images(spark, tsmall_catalog):
    return tsmall_catalog.read_spark(spark, "images")


def test_decode_stats_matches_numpy(images):
    got = multimodal.decode_stats(images).toPandas()
    specs = {s["image_id"]: s for s in fixtures.scene_specs("t-small")}
    one = got[(got.image_id == "scene-00000") & (got.band == 0)].iloc[0]
    arr = fixtures.scene_array(specs["scene-00000"])[0]
    data = arr[arr != 0]
    assert one.n_data == data.size
    assert abs(one["mean"] - float(data.mean())) < 1e-9
    assert one.p_min == int(data.min()) and one.p_max == int(data.max())
    assert set(got.band) == {0, 1, 2, 3, 4}


def test_thumbnails_carry_caption(images):
    th = multimodal.thumbnails(images, size=64).toPandas()
    caps = {s["image_id"]: s["caption"] for s in fixtures.scene_specs("t-small")}
    assert len(th) == 8
    for r in th.itertuples(index=False):
        assert r.caption == caps[r.image_id]  # byte-equal through the UDF
        arr = K.decode_payload(r.thumb)
        assert arr.shape == (5, 64, 64)


def test_verify_phash(images):
    out = multimodal.verify_phash(images).toPandas()
    assert out.ok.all()


def test_unknown_fmt_raises(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame([dict(image_id="x", bytes=b"\xff\xd8jpegdata", fmt="jpeg")])
    )
    with pytest.raises(Exception, match="NotImplementedError|decoder for fmt"):
        multimodal.decode_stats(df).collect()


def test_frame_sample_fanout(images):
    out = multimodal.frame_sample(images.limit(2), every_k=8).toPandas()
    assert (out.frame % 8 == 0).all()
    assert out.groupby("image_id").size().min() >= 1


# ------------------------------------------------------------- streaming --


def test_incremental_ingest_merge_on_read(spark, tsmall_catalog):
    """Two incremental batches (4 + 4 scenes) resolved by latest-gen must
    equal the one-shot batch ingest of all 8 scenes, tile-for-tile."""
    from geotrellis_landsat_emr_demo_spark.streaming import incremental

    root = os.path.join(SCRATCH, "incr")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    pdf = fixtures.images_pdf("t-small")
    cat.append_pandas(pdf.iloc[:4], "images")
    m1 = incremental.incremental_ingest(spark, cat, "landsat", max_zoom=13)
    assert m1["new_images"] == 4 and m1["gen"] == 1
    # no new images -> no work
    m2 = incremental.incremental_ingest(spark, cat, "landsat", max_zoom=13)
    assert m2["new_images"] == 0
    # append 4 more -> touched keys rebuilt from ALL contributors (gen 2)
    cat.append_pandas(pdf.iloc[4:], "images")
    m3 = incremental.incremental_ingest(spark, cat, "landsat", max_zoom=13)
    assert m3["new_images"] == 4 and m3["gen"] == 2

    resolved = (
        incremental.read_incremental_tiles(spark, cat, "landsat")
        .toPandas()
        .sort_values(["x", "y", "ts"])
        .reset_index(drop=True)
    )
    batch = (
        tsmall_catalog.read_pandas("tiles")
        .query("zoom == 13")
        .sort_values(["x", "y", "ts"])
        .reset_index(drop=True)
    )
    assert len(resolved) == len(batch)
    for i in range(len(batch)):
        assert (
            K.decode_payload(resolved.tile[i]) == K.decode_payload(batch.tile[i])
        ).all(), (batch.x[i], batch.y[i])
        assert resolved.caption[i] == batch.caption[i]
    # compaction rewrites one resolved generation
    n = incremental.compact_incremental(spark, cat, "landsat")
    assert n == len(batch)


def test_stream_ingest_files(spark):
    from geotrellis_landsat_emr_demo_spark.streaming import incremental

    root = os.path.join(SCRATCH, "stream")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    imdir = os.path.join(root, "incoming")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(imdir)
    pdf = fixtures.images_pdf("t-small")
    spark.createDataFrame(pdf.iloc[:4]).write.mode("append").parquet(imdir)
    q = incremental.stream_ingest_files(spark, imdir, cat, "landsat", ckpt)
    q.awaitTermination(120)
    tiles1 = cat.read_pandas("tiles_stream")
    assert len(tiles1) > 0
    # second batch of files -> second run picks up only the new ones
    spark.createDataFrame(pdf.iloc[4:]).write.mode("append").parquet(imdir)
    q2 = incremental.stream_ingest_files(spark, imdir, cat, "landsat", ckpt)
    q2.awaitTermination(120)
    tiles2 = cat.read_pandas("tiles_stream")
    assert len(tiles2) > len(tiles1)
    ts_distinct = tiles2.ts.nunique()
    assert ts_distinct == 2


def test_windowed_scene_stats_streaming(spark):
    """Drive the windowed agg through a real Structured Streaming query
    (memory sink) and compare to the batch equivalent."""
    from geotrellis_landsat_emr_demo_spark.streaming import incremental

    root = os.path.join(SCRATCH, "winstream")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    pdf = fixtures.images_pdf("t-small").drop(columns=["bytes"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(os.path.join(root, "in"))
    static = spark.read.parquet(os.path.join(root, "in"))
    stream = spark.readStream.schema(static.schema).parquet(os.path.join(root, "in"))
    agg = incremental.windowed_scene_stats(spark, stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("scene_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from scene_stats").toPandas().sort_values("window_start").reset_index(drop=True)
    expect = (
        incremental.windowed_scene_stats(spark, static)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert got.equals(expect)

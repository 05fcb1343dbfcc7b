"""Shared fixtures: one SparkSession + one ingested t-small catalog per run."""

from __future__ import annotations

import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SCRATCH = os.path.join(os.path.dirname(__file__), "..", ".scratch", "pytest")


@pytest.fixture(scope="session")
def spark():
    from geotrellis_landsat_emr_demo_spark.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tsmall_catalog(spark):
    """Catalog with t-small fixtures fully ingested (zooms 13..1)."""
    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    root = os.path.join(SCRATCH, "tsmall")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    fixtures.write_all(cat, "t-small")
    ingest.ingest_images(spark, cat, "landsat", max_zoom=13, min_zoom=1)
    return cat


@pytest.fixture(scope="session")
def svc(tsmall_catalog):
    from geotrellis_landsat_emr_demo_spark.plans.queries import LayerService

    return LayerService(tsmall_catalog)

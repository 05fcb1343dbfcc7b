"""PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the query/data-processing capabilities of
geotrellis/geotrellis-landsat-emr-demo (reference at /root/reference,
read-only) on idiomatic PySpark 4.x:

- ``core``       pure-numpy kernels (no Spark): ZXY tiling math, Morton cell
                 index, geometry (mercator reproject / ray-cast PIP), raster
                 kernels (NDVI/NDWI/render chain/bilinear), stdlib PNG codec.
- ``catalog``    thin Iceberg-like table layer over Parquet (atomic manifest
                 swap append, snapshots) so real Iceberg is a config swap.
- ``fixtures``   deterministic synthetic images/AOI/query-point corpora
                 (SEED=1337) per FIXTURES.md — no external data.
- ``operators``  ingest (decode -> chunk -> merge -> pyramid), spatial joins
                 (PIP, kNN, zonal), attribute/metadata aggregations.
- ``plans``      the query surface mirroring the reference server routes:
                 catalog, tile render (+overzoom), two-date diff, polygonal
                 mean, per-pixel time series.

Reference parity citations use file:line into /root/reference/.
"""

__version__ = "0.1.0"

SEED = 1337
TILE_SIZE = 256
MAX_ZOOM = 13  # conf/output.json:21 ("maxZoom": 13)
MIN_ZOOM = 1   # LandsatIngest.scala:42 (Pyramid.upLevels ... 13, 1)
NBANDS = 5     # bands red, green, blue, nir, QA (conf/input.json:7)
NODATA_U16 = 0  # UShortCellType NoData sentinel (LandsatInput.scala:47)

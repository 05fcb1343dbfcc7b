"""Apache Iceberg adapter for the engine catalog — the storage-backend
config swap.

The reference picks its tile store from configuration alone: ``server/
src/main/scala/demo/Main.scala:41-77`` switches between six GeoTrellis
``AttributeStore``/``ValueReader`` backends (file / hadoop / s3 /
accumulo / cassandra / hbase) with no change to query code.  This
engine's equivalent swap is the warehouse layer: :class:`catalog.Catalog`
(snapshot manifest + OCC commit + expiry over plain parquet) can be
replaced by a real Iceberg catalog — same verbs, Iceberg's
metadata/ACID machinery underneath — without touching the
operators/plans layers, which only consume DataFrames.

This module maps each :class:`catalog.Catalog` verb onto the public
Iceberg Spark surface (the DataFrameWriterV2 API and the ``system``
stored procedures documented at iceberg.apache.org/docs/latest/spark-*):

=====================  ====================================================
Catalog verb           Iceberg equivalent issued here
=====================  ====================================================
append_spark           ``df.writeTo(ident).append()`` (``create()`` first)
read_spark             ``spark.table(ident)``
snapshot_id            ``SELECT snapshot_id FROM ident.snapshots`` (latest)
history                ``SELECT snapshot_id FROM ident.history``
read_at                ``spark.read.option("snapshot-id", ...).table(...)``
rollback               ``CALL cat.system.rollback_to_snapshot(t, id)``
expire_snapshots       ``CALL cat.system.expire_snapshots(...)`` +
                       ``CALL cat.system.remove_orphan_files(...)``
commit markers         table properties on a ``__markers`` Iceberg table
                       (is_committed/marker read them back)
=====================  ====================================================

The sandbox has no network, so the Iceberg runtime jar usually cannot
be fetched; :func:`session_conf` returns the exact ``spark.jars.packages``
/ catalog configuration a connected deployment uses, and
:func:`try_build_session` attempts it, returning None if the package is
unavailable (tests skip).  Everything above the session — identifier
construction, SQL text, call order — is exercised offline by
tests/test_catalog.py's compile-check, so the swap is verified up to
the jar boundary.
"""

from __future__ import annotations

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def session_conf(
    warehouse: str, catalog_name: str = "local", package: str = ICEBERG_PACKAGE
) -> dict:
    """The Spark conf for a Hadoop-warehouse Iceberg catalog (the
    local/posix shape; S3 deployments change only ``warehouse`` and the
    underlying FileIO)."""
    return {
        "spark.jars.packages": package,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog_name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog_name}.type": "hadoop",
        f"spark.sql.catalog.{catalog_name}.warehouse": warehouse,
    }


def try_build_session(warehouse: str, catalog_name: str = "local", master: str = "local[4]"):
    """Attempt a real Iceberg-enabled session; None when the runtime jar
    cannot be resolved (offline sandbox)."""
    try:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.master(master).appName("iceberg-swap")
        for k, v in session_conf(warehouse, catalog_name).items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        # force catalog resolution so a missing jar fails HERE, not lazily
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog_name}.engine")
        return spark
    except Exception:
        return None


class IcebergCatalog:
    """:class:`catalog.Catalog`-shaped facade over an Iceberg catalog.

    Construct with a live Iceberg-enabled SparkSession; every method
    issues only public Iceberg Spark API / SQL.  ``sql_log`` records each
    statement for the offline compile-check."""

    MARKERS_TABLE = "__markers"

    def __init__(self, spark, catalog_name: str = "local", namespace: str = "engine"):
        self.spark = spark
        self.catalog_name = catalog_name
        self.namespace = namespace
        self.sql_log: list[str] = []

    # ------------------------------------------------------------ naming

    def identifier(self, table: str) -> str:
        # strict [A-Za-z0-9_]: every method emits UNQUOTED identifiers,
        # where '-' is invalid Spark SQL (ADVICE r7)
        for part in (self.catalog_name, self.namespace, table):
            if not part or not part.replace("_", "").isalnum() or "-" in part:
                raise ValueError(f"bad identifier part: {part!r}")
        return f"{self.catalog_name}.{self.namespace}.{table}"

    def _sql(self, stmt: str):
        self.sql_log.append(stmt)
        return self.spark.sql(stmt)

    def _exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self.identifier(table))

    # ------------------------------------------------------------ writes

    def append_spark(self, df, table: str, markers: dict | None = None) -> int:
        """df.writeTo(ident).append() — Iceberg's atomic snapshot commit
        plays the role of Catalog.commit's manifest lock."""
        ident = self.identifier(table)
        w = df.writeTo(ident)
        if self._exists(table):
            w.append()
        else:
            w.create()
        if markers:
            self._record_markers(markers)
        return self.snapshot_id(table)

    def replace_spark(self, df, table: str) -> int:
        df.writeTo(self.identifier(table)).createOrReplace()
        return self.snapshot_id(table)

    # markers: the engine's stage-completion ledger rides an ordinary
    # Iceberg table so it shares the warehouse's ACID and time travel
    def _record_markers(self, markers: dict):
        from pyspark.sql import Row
        import json as _json
        import time as _time

        rows = [
            Row(marker=k, at=float(_time.time()), meta=_json.dumps(v or {}))
            for k, v in markers.items()
        ]
        self.append_spark(self.spark.createDataFrame(rows), self.MARKERS_TABLE)

    def is_committed(self, marker: str) -> bool:
        return self.marker(marker) is not None

    def marker(self, marker: str):
        import json as _json

        if not self._exists(self.MARKERS_TABLE):
            return None
        from pyspark.sql import functions as F

        rows = (
            self.spark.table(self.identifier(self.MARKERS_TABLE))
            .filter(F.col("marker") == marker)
            .orderBy(F.col("at").desc())
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        return {"at": rows[0].at, **_json.loads(rows[0].meta)}

    # ------------------------------------------------------------- reads

    def read_spark(self, spark, table: str):
        return spark.table(self.identifier(table))

    def read_at(self, table: str, snapshot: int):
        return (
            self.spark.read.option("snapshot-id", int(snapshot))
            .table(self.identifier(table))
        )

    # ------------------------------------------------------- snapshot ops

    def snapshot_id(self, table: str) -> int:
        rows = self._sql(
            f"SELECT snapshot_id FROM {self.identifier(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0].snapshot_id) if rows else 0

    def history(self, table: str) -> list[int]:
        return [
            int(r.snapshot_id)
            for r in self._sql(
                f"SELECT snapshot_id FROM {self.identifier(table)}.history "
                "ORDER BY made_current_at"
            ).collect()
        ]

    def rollback(self, table: str, snapshot: int) -> int:
        self.identifier(table)  # validate BEFORE interpolating (ADVICE r7)
        self._sql(
            f"CALL {self.catalog_name}.system.rollback_to_snapshot"
            f"('{self.namespace}.{table}', {int(snapshot)})"
        )
        return self.snapshot_id(table)

    def expire_snapshots(
        self, table: str, keep_last: int = 3, older_than_s: float = 3600.0
    ) -> dict:
        """expire_snapshots + remove_orphan_files, the same pairing (and
        the same in-flight-writer age guard) Catalog.expire_snapshots
        implements over plain parquet."""
        import time as _time

        self.identifier(table)  # validate BEFORE interpolating (ADVICE r7)
        n_before = len(self.history(table))
        cutoff_ms = int((_time.time() - older_than_s) * 1000)
        ts = _timestamp_literal(cutoff_ms)
        exp = self._sql(
            f"CALL {self.catalog_name}.system.expire_snapshots("
            f"table => '{self.namespace}.{table}', "
            f"older_than => {ts}, retain_last => {int(keep_last)})"
        ).collect()
        orph = self._sql(
            f"CALL {self.catalog_name}.system.remove_orphan_files("
            f"table => '{self.namespace}.{table}', older_than => {ts})"
        ).collect()
        # the expire procedure returns ONE summary row of deleted-file
        # counts, so len(exp) was always 1 regardless of snapshots expired
        # (ADVICE r7) — count via snapshot history length instead
        del exp
        return dict(
            snapshots_removed=n_before - len(self.history(table)),
            files_removed=len(orph),
        )


def _timestamp_literal(ms: int) -> str:
    """Epoch millis -> an Iceberg-procedure TIMESTAMP literal."""
    import datetime

    dt = datetime.datetime.fromtimestamp(ms / 1000.0, tz=datetime.timezone.utc)
    return "TIMESTAMP '" + dt.strftime("%Y-%m-%d %H:%M:%S") + "'"

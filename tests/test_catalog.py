"""Catalog layer: atomic multi-table commits, markers, pruned reads."""

import os
import shutil

import pandas as pd
import pyarrow.dataset as ds

from geotrellis_landsat_emr_demo_spark.catalog import Catalog

from conftest import SCRATCH


def _cat(name):
    root = os.path.join(SCRATCH, name)
    shutil.rmtree(root, ignore_errors=True)
    return Catalog(root)


def test_append_and_snapshot():
    cat = _cat("c1")
    assert cat.snapshot_id() == 0
    cat.append_pandas(pd.DataFrame({"a": [1, 2]}), "t")
    assert cat.snapshot_id() == 1
    cat.append_pandas(pd.DataFrame({"a": [3]}), "t")
    assert cat.snapshot_id() == 2
    assert sorted(cat.read_pandas("t")["a"].tolist()) == [1, 2, 3]
    assert cat.history() == [0, 1]


def test_multi_table_atomic_commit_with_marker():
    cat = _cat("c2")
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = os.path.join(cat.table_dir("data"), "x.parquet")
    pq.write_table(pa.table({"v": [1]}), f1)
    f2 = os.path.join(cat.table_dir("lineage"), "y.parquet")
    pq.write_table(pa.table({"stage": ["s1"]}), f2)
    cat.commit({"data": [f1], "lineage": [f2]}, markers={"s1": {"rows": 1}})
    assert cat.is_committed("s1")
    assert cat.marker("s1")["rows"] == 1
    assert len(cat.files("data")) == 1 and len(cat.files("lineage")) == 1


def test_staged_files_invisible_until_commit():
    cat = _cat("c3")
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = os.path.join(cat.table_dir("t"), "orphan.parquet")
    pq.write_table(pa.table({"v": [1]}), f)
    # file exists on disk but is not in the manifest -> not visible
    assert cat.files("t") == []
    try:
        cat.read_pandas("t")
        assert False, "should raise"
    except FileNotFoundError:
        pass
    cat.commit({"t": [f]})
    assert len(cat.files("t")) == 1


def test_read_at_with_file_metadata():
    # files committed with {path, meta} entries (the tiles-table shape) must
    # stay time-travel readable — regression for the dict-entry read_at crash
    cat = _cat("c6")
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = os.path.join(cat.table_dir("tiles"), "a.parquet")
    pq.write_table(pa.table({"v": [1]}), f1)
    cat.commit({"tiles": [(f1, {"zoom": 13})]})          # snapshot 1
    f2 = os.path.join(cat.table_dir("tiles"), "b.parquet")
    pq.write_table(pa.table({"v": [2]}), f2)
    cat.commit({"tiles": [(f2, {"zoom": 12})]})          # snapshot 2
    assert cat.read_at("tiles", 1).to_pandas()["v"].tolist() == [1]
    assert sorted(cat.read_at("tiles", 2).to_pandas()["v"]) == [1, 2]
    assert cat.files("tiles", zoom=13) == [f1]


def test_pruned_arrow_read():
    cat = _cat("c4")
    cat.append_pandas(pd.DataFrame({"k": range(100), "v": range(100)}), "t")
    tbl = cat.read_arrow("t", filters=(ds.field("k") == 42), columns=["v"])
    assert tbl.num_rows == 1 and tbl["v"][0].as_py() == 42


def test_rollback_and_time_travel():
    cat = _cat("c5")
    cat.append_pandas(pd.DataFrame({"a": [1]}), "t")     # snapshot 1
    cat.append_pandas(pd.DataFrame({"a": [2]}), "t")     # snapshot 2
    assert sorted(cat.read_pandas("t")["a"]) == [1, 2]
    # as-of read of snapshot 1
    assert cat.read_at("t", 1).to_pandas()["a"].tolist() == [1]
    # rollback to snapshot 1: current view loses row 2, files stay on disk
    cat.rollback(1)
    assert cat.read_pandas("t")["a"].tolist() == [1]
    assert cat.snapshot_id() == 3  # monotonic
    # roll forward again via the preserved snapshot-2 manifest
    cat.rollback(2)
    assert sorted(cat.read_pandas("t")["a"]) == [1, 2]


def test_replace_optimistic_concurrency():
    """replace(expected_snapshot=...) is the Iceberg-style commit guard: a
    commit landing between a rewrite's scan and its publish must raise
    CommitConflict instead of silently dropping the racing files."""
    import pytest

    from geotrellis_landsat_emr_demo_spark.catalog import CommitConflict

    cat = _cat("c6")
    cat.append_pandas(pd.DataFrame({"a": [1]}), "t")
    base = cat.snapshot_id()
    files = [p for p, _ in cat.file_entries("t")]
    # racing append lands after the scan
    cat.append_pandas(pd.DataFrame({"a": [2]}), "t")
    with pytest.raises(CommitConflict):
        cat.replace("t", [(files[0], None)], expected_snapshot=base)
    # the racing row survived (the rewrite was refused)
    assert sorted(cat.read_pandas("t")["a"]) == [1, 2]
    # retry from the fresh snapshot succeeds
    fresh = cat.snapshot_id()
    keep = [(p, m) for p, m in cat.file_entries("t")]
    assert cat.replace("t", keep, expected_snapshot=fresh) > fresh


def test_manifest_cache_invalidates_on_external_write():
    """The mtime/size-keyed manifest cache must see commits made through a
    DIFFERENT Catalog instance (e.g. a serving process next to an ingest
    job) — the cache key is the file stat, not process state."""
    cat_w = _cat("c7")
    cat_w.append_pandas(pd.DataFrame({"a": [1]}), "t")
    cat_r = Catalog(cat_w.root)
    assert cat_r.snapshot_id() == cat_w.snapshot_id()
    s0 = cat_r.snapshot_id()
    cat_w.append_pandas(pd.DataFrame({"a": [2]}), "t")
    assert cat_r.snapshot_id() == s0 + 1  # cache invalidated by new stat
    assert sorted(cat_r.read_pandas("t")["a"]) == [1, 2]


def test_expire_snapshots_and_orphans(tmp_path):
    """expire_snapshots: history beyond keep_last drops, data files no
    retained manifest references are physically deleted (with the
    in-flight age guard), and the live table remains readable."""
    import os
    import time

    import pandas as pd
    import pyarrow.parquet as pq

    from geotrellis_landsat_emr_demo_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.append_pandas(pd.DataFrame({"a": [1, 2]}), "t")          # snap 1
    old_file = cat.files("t")[0]
    # rewrite the table -> old file only reachable via history
    new_path = os.path.join(cat.table_dir("t"), "rewrite.parquet")
    import pyarrow as pa

    pq.write_table(pa.table({"a": [1, 2]}), new_path)
    cat.replace("t", [new_path])                                  # snap 2
    # a recent uncommitted staged file must survive the age guard
    staged = os.path.join(cat.table_dir("t"), "staged.parquet")
    pq.write_table(pa.table({"a": [9]}), staged)
    os.utime(old_file, (time.time() - 10, time.time() - 10))
    # keep_last=1 RETAINS the pre-rewrite snapshot -> the old file is
    # still time-travel-reachable and must survive
    assert cat.expire_snapshots(keep_last=1, older_than_s=5)["files_removed"] == 0
    assert os.path.exists(old_file)
    # dropping all history releases it
    stats = cat.expire_snapshots(keep_last=0, older_than_s=5)
    assert stats["files_removed"] == 1 and not os.path.exists(old_file)
    assert os.path.exists(staged)            # too new -> protected
    assert cat.read_pandas("t").a.tolist() == [1, 2]   # live read intact
    # aged + still uncommitted -> removed by the next run
    os.utime(staged, (time.time() - 10, time.time() - 10))
    assert cat.expire_snapshots(keep_last=1, older_than_s=5)["files_removed"] == 1


# ---------------------------------------------------------------- iceberg --


class _FakeDF:
    """Records the DataFrameWriterV2 call chain (writeTo -> append/create)."""

    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        self.log.append(("writeTo", ident))
        return self

    def append(self):
        self.log.append(("append",))

    def create(self):
        self.log.append(("create",))

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


class _FakeRow:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _FakeSpark:
    """Just enough SparkSession surface to compile-check the adapter's
    identifier construction and SQL text offline (the runtime jar is not
    fetchable in this sandbox)."""

    def __init__(self):
        self.sqls = []
        self.tables = {"local.engine.images"}

        class _Cat:
            def tableExists(_s, ident):
                return ident in self.tables

        self.catalog = _Cat()

        class _Reader:
            def __init__(_s):
                _s.opts = {}

            def option(_s, k, v):
                _s.opts[k] = v
                return _s

            def table(_s, ident):
                return ("read_at", ident, dict(_s.opts))

        self._reader_cls = _Reader

    @property
    def read(self):
        return self._reader_cls()

    def sql(self, stmt):
        self.sqls.append(stmt)

        class _Res:
            def collect(_s):
                if ".snapshots" in stmt:
                    return [_FakeRow(snapshot_id=42)]
                if ".history" in stmt:
                    return [_FakeRow(snapshot_id=41), _FakeRow(snapshot_id=42)]
                return []

        return _Res()

    def table(self, ident):
        return ("table", ident)


def test_iceberg_adapter_compile_check():
    """VERDICT r6 task 7: the Catalog -> Iceberg swap, verified up to the
    jar boundary — identifier construction, DataFrameWriterV2 call
    chain, snapshot/history/rollback/expire SQL text — all via the
    public Iceberg Spark surface, no live JVM needed."""
    import pytest

    from geotrellis_landsat_emr_demo_spark.sources import iceberg as ib

    conf = ib.session_conf("/tmp/wh")
    assert conf["spark.jars.packages"].startswith("org.apache.iceberg:")
    assert conf["spark.sql.catalog.local.type"] == "hadoop"

    fs = _FakeSpark()
    cat = ib.IcebergCatalog(fs, "local", "engine")
    assert cat.identifier("tiles") == "local.engine.tiles"
    with pytest.raises(ValueError):
        cat.identifier("tiles; drop table x")

    # append on existing table -> writeTo().append(); new -> create()
    log = []
    cat.append_spark(_FakeDF(log), "images")
    assert ("writeTo", "local.engine.images") in log and ("append",) in log
    log2 = []
    cat.append_spark(_FakeDF(log2), "tiles")
    assert ("create",) in log2 and ("append",) not in log2

    # snapshot/history/read_at/rollback statements
    assert cat.snapshot_id("images") == 42
    assert cat.history("images") == [41, 42]
    assert cat.read_at("images", 41) == (
        "read_at", "local.engine.images", {"snapshot-id": 41},
    )
    cat.rollback("images", 41)
    assert any(
        "CALL local.system.rollback_to_snapshot('engine.images', 41)" in s
        for s in fs.sqls
    )
    cat.expire_snapshots("images", keep_last=2, older_than_s=60)
    assert any("system.expire_snapshots" in s and "retain_last => 2" in s for s in fs.sqls)
    assert any("system.remove_orphan_files" in s for s in fs.sqls)
    assert any("TIMESTAMP '" in s for s in fs.sqls)


def test_iceberg_live_swap_if_available():
    """Full live swap when the Iceberg runtime jar is resolvable (it is
    not in this offline sandbox — the test then skips, documenting the
    exact deployment config)."""
    import pytest

    from geotrellis_landsat_emr_demo_spark.sources import iceberg as ib

    wh = os.path.join(SCRATCH, "iceberg-wh")
    shutil.rmtree(wh, ignore_errors=True)
    spark = ib.try_build_session(wh)
    if spark is None:
        pytest.skip("Iceberg runtime jar not resolvable (offline sandbox)")
    try:
        cat = ib.IcebergCatalog(spark)
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        cat.append_spark(df, "t")
        assert sorted(r.id for r in cat.read_spark(spark, "t").collect()) == [1, 2]
        s1 = cat.snapshot_id("t")
        cat.append_spark(df, "t")
        assert cat.read_spark(spark, "t").count() == 4
        assert cat.read_at("t", s1).count() == 2
        cat.rollback("t", s1)
        assert cat.read_spark(spark, "t").count() == 2
    finally:
        spark.stop()

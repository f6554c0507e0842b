"""Contract tests for IcebergSink (plans/sink.py) without an Iceberg jar.

A recording fake stands in for SparkSession: every SQL string the sink
issues is captured and asserted against the committed semantics the parquet
sink implements (epoch skip, strict ordinal guard, soft-delete tombstones,
stamp-after-merge, probe-before-ADD-COLUMN).  This pins the production path
the sandbox can't execute — in particular the OSS-Spark parser rule that
``ADD COLUMN IF NOT EXISTS`` does not exist (only ADD PARTITION has the
IF NOT EXISTS form), which previously made create() raise on every call.
"""

from __future__ import annotations

import pytest

from jurisprudencia_privada_etl_spark.plans import manifest as mf
from jurisprudencia_privada_etl_spark.plans.sink import IcebergSink
from jurisprudencia_privada_etl_spark.schemas import SchemaChange, TableSchema


class _Chain:
    """Attribute chain that never raises — stands in for spark._jvm.…"""

    def __getattr__(self, name):
        return _Chain()


class FakeDF:
    def __init__(self, columns=(), rows=(), spark=None):
        self.columns = list(columns)
        self._rows = list(rows)
        self.spark = spark
        self.filters = []

    def collect(self):
        return self._rows

    def where(self, cond):
        self.filters.append(str(cond))
        return self

    def createOrReplaceTempView(self, name):
        if self.spark is not None:
            self.spark.temp_views.append(name)


class FakeSpark:
    """Records every SQL statement; answers SHOW TBLPROPERTIES / snapshots /
    table() from a tiny in-memory catalog."""

    def __init__(self, table_columns=(), props=None, snapshots=()):
        self.statements: list[str] = []
        self.temp_views: list[str] = []
        self.table_columns = list(table_columns)
        self.props = dict(props or {})
        self.snapshots = list(snapshots)
        self._jvm = _Chain()

    def sql(self, q: str) -> FakeDF:
        self.statements.append(" ".join(q.split()))
        if q.strip().startswith("SHOW TBLPROPERTIES"):
            return FakeDF(
                rows=[{"key": k, "value": v} for k, v in self.props.items()]
            )
        if ".snapshots" in q:
            return FakeDF(rows=self.snapshots)
        if q.strip().upper().startswith("ALTER TABLE") and "TBLPROPERTIES" in q:
            # emulate the stamp so later last_committed_epoch() calls see it
            part = q.split("TBLPROPERTIES", 1)[1]
            kv = part.strip(" ()").replace("'", "").split("=")
            self.props[kv[0]] = kv[1]
        return FakeDF()

    def table(self, name: str) -> FakeDF:
        return FakeDF(columns=self.table_columns)


SCHEMA = TableSchema.from_json(
    [
        {"id": 1, "name": "repo", "type": "string"},
        {"id": 2, "name": "path", "type": "string"},
        {"id": 3, "name": "content", "type": "string"},
    ]
)


def _sink(spark):
    return IcebergSink(spark, "lake.docs")


def test_create_new_table_issues_no_alter():
    spark = FakeSpark(table_columns=["repo", "path", "content", "ordinal", "content_sha", "deleted"])
    _sink(spark).create(SCHEMA)
    assert len(spark.statements) == 1
    create = spark.statements[0]
    assert create.startswith("CREATE TABLE IF NOT EXISTS lake.docs")
    assert "deleted boolean" in create and "USING iceberg" in create
    assert "PARTITIONED BY (bucket(64, repo))" in create
    # soft-delete rows + MERGE need format v2; the default mode is explicit
    assert "'format-version'='2'" in create
    assert "'write.merge.mode'='copy-on-write'" in create


def test_create_mor_table_sets_merge_on_read_properties():
    """write_mode="mor" maps to Iceberg v2's native merge-on-read table
    properties (position/equality delete files instead of rewritten data
    files) — the production analog of HadoopParquetSink's delta emulation.
    The MERGE/maintenance SQL is mode-independent; Iceberg picks the
    physical strategy from these properties."""
    spark = FakeSpark(table_columns=["repo", "path", "content", "ordinal", "content_sha", "deleted"])
    IcebergSink(spark, "lake.docs", write_mode="mor").create(SCHEMA)
    create = spark.statements[0]
    assert "'format-version'='2'" in create
    for prop in ("write.merge.mode", "write.update.mode", "write.delete.mode"):
        assert f"'{prop}'='merge-on-read'" in create


def test_create_migrates_pre_soft_delete_table_with_valid_sql():
    spark = FakeSpark(table_columns=["repo", "path", "content", "ordinal", "content_sha"])
    _sink(spark).create(SCHEMA)
    assert spark.statements[1] == "ALTER TABLE lake.docs ADD COLUMNS (deleted boolean)"
    # the regression: ADD COLUMN IF NOT EXISTS is not valid OSS Spark SQL
    assert not any("COLUMN IF NOT EXISTS" in s for s in spark.statements)


def test_evolve_probes_before_add_and_skips_existing():
    spark = FakeSpark(table_columns=["repo", "path", "content", "area"])
    sink = _sink(spark)
    sink.evolve([SchemaChange(kind="add", name="area", dtype="string")])
    assert spark.statements == []  # column exists → no DDL at all
    sink.evolve([SchemaChange(kind="add", name="n_tokens", dtype="int")])
    assert spark.statements == ["ALTER TABLE lake.docs ADD COLUMNS (n_tokens int)"]
    sink.evolve([SchemaChange(kind="rename", name="area", new_name="topic")])
    assert spark.statements[-1] == "ALTER TABLE lake.docs RENAME COLUMN area TO topic"
    assert not any("COLUMN IF NOT EXISTS" in s for s in spark.statements)


def test_last_committed_epoch_prefers_property_then_snapshot_summary():
    assert _sink(FakeSpark(props={mf.EPOCH_PROPERTY: "7"})).last_committed_epoch() == 7
    assert _sink(FakeSpark(snapshots=[{"e": "3"}])).last_committed_epoch() == 3
    assert _sink(FakeSpark()).last_committed_epoch() == -1


def test_merge_skips_already_committed_epoch():
    spark = FakeSpark(props={mf.EPOCH_PROPERTY: "5"})
    out = _sink(spark).merge(FakeDF(columns=["repo", "path", "op", "ordinal"]), epoch=5)
    assert out["skipped"] is True
    assert not any("MERGE INTO" in s for s in spark.statements)
    # same gate as the parquet sink
    assert mf.epoch_already_applied(5, 5) and not mf.epoch_already_applied(5, 6)


def test_merge_sql_matches_parquet_sink_semantics():
    spark = FakeSpark(props={mf.EPOCH_PROPERTY: "1"})
    updates = FakeDF(
        columns=["repo", "path", "content", "op", "ordinal", "content_sha"], spark=spark
    )
    out = _sink(spark).merge(updates, epoch=2)
    assert out == {"epoch": 2, "engine": "iceberg"}
    assert spark.temp_views == ["_updates"]
    merge_idx = next(i for i, s in enumerate(spark.statements) if "MERGE INTO" in s)
    stamp_idx = next(i for i, s in enumerate(spark.statements) if "SET TBLPROPERTIES" in s)
    m = spark.statements[merge_idx]
    # strict LWW guard: late lower-ordinal events are row-level no-ops
    assert "WHEN MATCHED AND s.ordinal > t.ordinal THEN UPDATE SET" in m
    # tombstones are soft-deletes driven by op, on both branches
    assert "t.deleted = (s.op = 'D')" in m
    assert "WHEN NOT MATCHED THEN INSERT" in m and "(s.op = 'D')" in m.split("INSERT", 1)[1]
    # 'op' itself is bookkeeping, never stored as a column assignment
    assert "t.op =" not in m
    # exactly-once ordering: the epoch stamp commits AFTER the merge, so a
    # crash between them re-runs an idempotent merge instead of losing data
    assert stamp_idx > merge_idx
    assert spark.props[mf.EPOCH_PROPERTY] == "2"
    # and a replayed epoch is now a no-op
    assert _sink(spark).merge(updates, epoch=2)["skipped"] is True


def test_vacuum_deletes_past_ordinal_horizon():
    spark = FakeSpark()
    _sink(spark).vacuum(1000)
    assert spark.statements == ["DELETE FROM lake.docs WHERE deleted AND ordinal < 1000"]


def test_delete_where_purges_payload_in_one_update():
    """The purge must null every non-key payload/bookkeeping column (PII
    leaves the current snapshot immediately), stamp the tombstone ordinal,
    and touch only LIVE rows — one row-level UPDATE."""
    spark = FakeSpark(
        table_columns=["repo", "path", "content", "ordinal", "content_sha", "deleted"]
    )
    out = _sink(spark).delete_where("lang = 'md'", 5000)
    assert out == {"purge_ordinal": 5000}
    assert spark.statements == [
        "UPDATE lake.docs SET content = NULL, content_sha = NULL, "
        "ordinal = 5000, deleted = true "
        "WHERE (lang = 'md') AND NOT coalesce(deleted, false)"
    ]


def test_load_filters_soft_deletes(spark):
    # the real session fixture is only needed so Column expressions resolve
    fake = FakeSpark(table_columns=["repo", "path", "deleted"])
    df = _sink(fake).load()
    assert len(df.filters) == 1 and "deleted" in df.filters[0]


def test_constructor_requires_extension():
    class NoJvm:
        @property
        def _jvm(self):
            raise RuntimeError("no jvm")

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergSink(NoJvm(), "lake.docs")


def test_compact_calls_rewrite_data_files_procedure():
    spark = FakeSpark()
    out = _sink(spark).compact()
    assert out == {"compacted": True}
    assert spark.statements == [
        "CALL spark_catalog.system.rewrite_data_files(table => 'lake.docs')"
    ]
    spark2 = FakeSpark()
    _sink(spark2).compact(target_file_size_bytes=512 * 1024 * 1024)
    assert "map('target-file-size-bytes', '536870912')" in spark2.statements[0]


def test_compact_uses_explicit_catalog_when_qualified():
    spark = FakeSpark()
    IcebergSink(spark, "prod.lake.docs").compact()
    assert spark.statements[0].startswith("CALL prod.system.rewrite_data_files")


def test_procedures_use_session_default_catalog_for_2part_names():
    """2-part identifiers resolve against spark.sql.defaultCatalog, so the
    system procedures must be CALLed on THAT catalog, not a hard-coded
    spark_catalog (round-3 advice)."""

    class _Conf:
        def get(self, key, default=None):
            return {"spark.sql.defaultCatalog": "lake_cat"}.get(key, default)

    spark = FakeSpark()
    spark.conf = _Conf()
    _sink(spark).compact()
    assert spark.statements[0].startswith("CALL lake_cat.system.rewrite_data_files")
    spark2 = FakeSpark()
    spark2.conf = _Conf()
    _sink(spark2).expire_snapshots(keep_last=2)
    assert spark2.statements[0].startswith("CALL lake_cat.system.expire_snapshots")
    # fully-qualified names still win over the session default
    spark3 = FakeSpark()
    spark3.conf = _Conf()
    IcebergSink(spark3, "prod.lake.docs").compact()
    assert spark3.statements[0].startswith("CALL prod.system.rewrite_data_files")


def test_expire_snapshots_calls_procedure_with_retention():
    spark = FakeSpark()
    out = _sink(spark).expire_snapshots(keep_last=3)
    assert out == {"expired": True, "retain_last": 3}
    assert spark.statements == [
        "CALL spark_catalog.system.expire_snapshots(table => 'lake.docs', retain_last => 3)"
    ]
    # retention floor: never expire everything
    spark2 = FakeSpark()
    _sink(spark2).expire_snapshots(keep_last=0)
    assert "retain_last => 1" in spark2.statements[0]


def test_load_version_as_of_time_travel():
    spark = FakeSpark()
    df = _sink(spark).load(version=123456789)
    assert spark.statements == ["SELECT * FROM lake.docs VERSION AS OF 123456789"]
    # soft-delete rows are filtered on every read path, time travel included
    assert df.filters


def test_snapshots_reads_metadata_table():
    spark = FakeSpark(snapshots=[{"snapshot_id": 1, "operation": "append"}])
    out = _sink(spark).snapshots()
    assert out == [{"snapshot_id": 1, "operation": "append"}]
    assert "FROM lake.docs.snapshots ORDER BY committed_at" in spark.statements[0]


def test_remove_orphan_files_calls_procedure_with_horizon():
    spark = FakeSpark()
    out = _sink(spark).remove_orphan_files(older_than_s=3600.0)
    assert out == {"orphan_dirs": [], "dry_run": False}
    (stmt,) = spark.statements
    assert stmt.startswith(
        "CALL spark_catalog.system.remove_orphan_files(table => 'lake.docs', "
        "older_than => TIMESTAMP '"
    )
    assert "dry_run" not in stmt
    spark2 = FakeSpark()
    _sink(spark2).remove_orphan_files(older_than_s=3600.0, dry_run=True)
    assert spark2.statements[0].endswith(", dry_run => true)")


def test_branch_ddl_and_fast_forward_procedure():
    spark = FakeSpark()
    s = _sink(spark)
    s.create_branch("wip")
    s.create_branch("pinned", version=42)
    s.fast_forward("wip")
    s.drop_branch("wip")
    assert spark.statements == [
        "ALTER TABLE lake.docs CREATE BRANCH `wip`",
        "ALTER TABLE lake.docs CREATE BRANCH `pinned` AS OF VERSION 42",
        "CALL spark_catalog.system.fast_forward(table => 'lake.docs', "
        "branch => 'main', to => 'wip')",
        "ALTER TABLE lake.docs DROP BRANCH `wip`",
    ]


def test_rollback_calls_system_procedure():
    spark = FakeSpark()
    out = _sink(spark).rollback(12345)
    assert out == {"restored_version": 12345}
    assert spark.statements == [
        "CALL spark_catalog.system.rollback_to_snapshot("
        "table => 'lake.docs', snapshot_id => 12345)"
    ]

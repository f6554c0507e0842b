"""Column-drop schema evolution (T6 extension): metadata-only, like
Iceberg's ``ALTER TABLE .. DROP COLUMN``.  Data files keep the bytes;
readers stop projecting the id.  The hazard this file pins is ID REUSE:
without ``last_column_id`` (Iceberg's ``last-column-id`` analog), dropping
the max-id column and adding a new one would hand the new column the
dropped column's id, and the by-id reader would resurrect the dropped
bytes from pre-drop files under the new name."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import types as T

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import (
    CHANGELOG_SCHEMA,
    TARGET_SCHEMA,
    SchemaChange,
    TableSchema,
    apply_changes,
)


def _stars_schema(dtype=T.IntegerType()):
    return T.StructType(list(CHANGELOG_SCHEMA.fields) + [T.StructField("stars", dtype, True)])


def test_drop_is_metadata_only_and_time_travel_keeps_values(spark, tmp_path):
    """Epoch 0 adds `stars` with values; epoch 1 drops it.  The drop must
    not rewrite any data file (pure manifest publish), the current read
    must not show the column, and time travel to the pre-drop version must
    still read the values."""
    path = str(tmp_path / "t")
    cfg = ReplayConfig(
        schema_evolution={
            0: [SchemaChange("add", "stars", dtype="int")],
            1: [SchemaChange("drop", "stars")],
        }
    )
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7),
         (0, 2, "I", "r1", "b.py", "c2", "ts", "v2", 3)],
        schema=_stars_schema(),
    )
    process_epoch(spark, sink, e0, 0, cfg)
    v_before = sink.manifest().version
    files_before = set(glob.glob(f"{path}/data/**/*.parquet", recursive=True))

    # untouched-key epoch: the drop publishes, then the merge touches c.py only
    e1 = spark.createDataFrame(
        [(1, 3, "I", "r1", "c.py", "c3", "go", "v3")], schema=CHANGELOG_SCHEMA
    )
    process_epoch(spark, sink, e1, 1, cfg)

    df = sink.load()
    assert "stars" not in df.columns
    assert df.count() == 3
    # pre-drop files untouched on disk (copy-on-write + metadata-only drop)
    assert files_before <= set(glob.glob(f"{path}/data/**/*.parquet", recursive=True))
    # time travel to the pre-drop snapshot still projects the column
    old = sink.load(version=v_before).orderBy("path").toPandas()
    assert list(old["stars"]) == [7, 3]


def test_readd_after_drop_gets_fresh_id_and_never_resurrects(spark, tmp_path):
    """add stars → values land → drop → re-add.  The re-added column must
    carry a FRESH id, so rows still served by pre-drop data files read
    null, not the dropped bytes."""
    path = str(tmp_path / "t")
    cfg = ReplayConfig(
        schema_evolution={
            0: [SchemaChange("add", "stars", dtype="int")],
            1: [SchemaChange("drop", "stars")],
            2: [SchemaChange("add", "stars", dtype="int")],
        }
    )
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7),
         (0, 2, "I", "r2", "b.py", "c2", "ts", "v2", 3)],
        schema=_stars_schema(),
    )
    process_epoch(spark, sink, e0, 0, cfg)
    id_before = next(
        c.col_id for c in sink.manifest().schema.columns if c.name == "stars"
    )
    e1 = spark.createDataFrame(
        [(1, 3, "U", "r1", "a.py", "c3", "py", "v1b")], schema=CHANGELOG_SCHEMA
    )
    process_epoch(spark, sink, e1, 1, cfg)
    # epoch 2 re-adds stars; only the new row carries a value
    e2 = spark.createDataFrame(
        [(2, 4, "I", "r3", "c.py", "c4", "go", "v3", 9)], schema=_stars_schema()
    )
    process_epoch(spark, sink, e2, 2, cfg)

    schema = sink.manifest().schema
    id_after = next(c.col_id for c in schema.columns if c.name == "stars")
    assert id_after > id_before, "re-add must never reuse a dropped id"
    assert schema.last_column_id == id_after

    out = sink.load().orderBy("path").toPandas()
    # r2/b.py is still served by the PRE-drop epoch-0 file (its bucket was
    # never rewritten) — its physical stars=3 must NOT resurrect
    by_path = dict(zip(out["path"], out["stars"]))
    assert by_path["c.py"] == 9
    assert by_path["a.py"] is None or by_path["a.py"] != by_path["a.py"]  # null/NaN
    assert by_path["b.py"] is None or by_path["b.py"] != by_path["b.py"]  # null/NaN


def test_drop_guards_and_idempotence():
    ts = apply_changes(
        TableSchema.from_struct(TARGET_SCHEMA), [SchemaChange("add", "stars", dtype="int")]
    )
    with pytest.raises(ValueError, match="key column"):
        apply_changes(ts, [SchemaChange("drop", "repo")])
    dropped = apply_changes(ts, [SchemaChange("drop", "stars")])
    assert "stars" not in dropped.names()
    # crash-replayed epoch re-applies its evolution: absent column is a no-op
    again = apply_changes(dropped, [SchemaChange("drop", "stars")])
    assert again.to_json() == dropped.to_json()
    # the high-water mark survives the drop
    assert dropped.last_column_id == ts.last_column_id


def test_schema_json_roundtrip_and_legacy_list_form():
    ts = apply_changes(
        TableSchema.from_struct(TARGET_SCHEMA), [SchemaChange("add", "stars", dtype="int")]
    )
    rt = TableSchema.from_json(ts.to_json())
    assert rt.to_json() == ts.to_json()
    # manifests written before drop existed serialize as a bare column list
    legacy = TableSchema.from_json([c.to_json() for c in ts.columns])
    assert legacy.names() == ts.names()
    assert legacy.last_column_id == max(c.col_id for c in ts.columns)


def test_change_feed_across_drop_uses_to_version_schema(spark, tmp_path):
    """A feed spanning a drop emits images in the TO schema (Delta CDF
    semantics): the dropped column simply vanishes from pre/post images."""
    from jurisprudencia_privada_etl_spark.operators.change_feed import change_feed

    path = str(tmp_path / "t")
    cfg = ReplayConfig(
        schema_evolution={
            0: [SchemaChange("add", "stars", dtype="int")],
            1: [SchemaChange("drop", "stars")],
        }
    )
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7)], schema=_stars_schema()
    )
    process_epoch(spark, sink, e0, 0, cfg)
    v0 = sink.manifest().version
    e1 = spark.createDataFrame(
        [(1, 2, "U", "r1", "a.py", "c2", "py", "v1b")], schema=CHANGELOG_SCHEMA
    )
    process_epoch(spark, sink, e1, 1, cfg)

    feed = change_feed(sink, from_version=v0).toPandas()
    assert "stars" not in feed.columns
    assert set(feed["_change_type"]) == {"update_preimage", "update_postimage"}

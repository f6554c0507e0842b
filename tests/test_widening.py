"""Type-widening schema evolution (T6 extension): int→bigint, float→double,
decimal precision growth — metadata-only, cast-on-read, Iceberg's safe
promotion set.  Pre-widen data files keep their written physical type; the
id-mapped load up-casts; merges align incoming narrow epochs to the
current type so every file matches its writing snapshot's declared schema.
"""

from __future__ import annotations

import pandas as pd
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

from tests.test_fixtures import make_log


def _stars_schema(dtype):
    return T.StructType(list(CHANGELOG_SCHEMA.fields) + [T.StructField("stars", dtype, True)])


def test_widen_int_to_bigint_mid_replay(spark, tmp_path):
    """Epoch 0 adds `stars INT`; epoch 2 widens it to BIGINT and writes a
    value above 2^31.  Old files stay int on disk, read back as bigint,
    values intact — no data rewrite."""
    path = str(tmp_path / "t")
    cfg = ReplayConfig(
        schema_evolution={
            0: [SchemaChange("add", "stars", dtype="int")],
            2: [SchemaChange("widen", "stars", dtype="bigint")],
        }
    )
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))

    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7),
         (0, 2, "I", "r1", "b.py", "c2", "ts", "v2", 3)],
        schema=_stars_schema(T.IntegerType()),
    )
    process_epoch(spark, sink, e0, 0, cfg)
    # epoch 1: no evolution, still int-typed input
    e1 = spark.createDataFrame(
        [(1, 3, "U", "r1", "b.py", "c3", "ts", "v2b", 4)],
        schema=_stars_schema(T.IntegerType()),
    )
    process_epoch(spark, sink, e1, 1, cfg)
    # epoch 2: widened — a count that no longer fits in int32
    big = 3_000_000_000
    e2 = spark.createDataFrame(
        [(2, 4, "I", "r1", "c.py", "c4", "go", "v3", big)],
        schema=_stars_schema(T.LongType()),
    )
    process_epoch(spark, sink, e2, 2, cfg)

    df = sink.load()
    assert dict(df.dtypes)["stars"] == "bigint"
    out = df.orderBy("path").toPandas()
    assert list(out["stars"]) == [7, 4, big]
    assert sink.manifest().schema.columns[-1].dtype == "bigint"


def test_widen_then_narrow_epoch_still_merges(spark, tmp_path):
    """After the widen, a producer still emitting the OLD int type must
    merge cleanly (cast at the merge input), and the written file's type
    matches the declared schema."""
    path = str(tmp_path / "t")
    cfg = ReplayConfig(
        schema_evolution={
            0: [SchemaChange("add", "stars", dtype="int")],
            1: [SchemaChange("widen", "stars", dtype="bigint")],
        }
    )
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7)],
        schema=_stars_schema(T.IntegerType()),
    )
    process_epoch(spark, sink, e0, 0, cfg)
    # epoch 1 declares the widen but the producer still sends int
    e1 = spark.createDataFrame(
        [(1, 2, "U", "r1", "a.py", "c2", "py", "v1b", 9)],
        schema=_stars_schema(T.IntegerType()),
    )
    process_epoch(spark, sink, e1, 1, cfg)
    df = sink.load()
    assert dict(df.dtypes)["stars"] == "bigint"
    assert df.first()["stars"] == 9
    # the epoch-1 file itself must be bigint (matches its writing snapshot)
    import glob
    import pyarrow.parquet as pq

    newest = max(
        glob.glob(f"{path}/data/v*/"),
        key=lambda p: int(p.split("/v")[-1].strip("/").split("-")[0]),
    )
    files = glob.glob(f"{newest}/**/*.parquet", recursive=True)
    types = {str(pq.read_schema(f).field("stars").type) for f in files}
    assert types == {"int64"}


def test_widen_rejects_narrowing_and_cross_family(spark):
    ts = apply_changes(
        TableSchema.from_struct(TARGET_SCHEMA),
        [SchemaChange("add", "stars", dtype="bigint"),
         SchemaChange("add", "ratio", dtype="double")],
    )
    with pytest.raises(ValueError, match="illegal widen"):
        apply_changes(ts, [SchemaChange("widen", "stars", dtype="int")])
    with pytest.raises(ValueError, match="illegal widen"):
        apply_changes(ts, [SchemaChange("widen", "ratio", dtype="float")])
    with pytest.raises(ValueError, match="illegal widen"):
        apply_changes(ts, [SchemaChange("widen", "stars", dtype="string")])
    # decimal precision growth at same scale is legal; scale change is not
    ts2 = apply_changes(ts, [SchemaChange("add", "amt", dtype="decimal(10,2)")])
    ts3 = apply_changes(ts2, [SchemaChange("widen", "amt", dtype="decimal(18,2)")])
    assert ts3.columns[-1].dtype == "decimal(18,2)"
    with pytest.raises(ValueError, match="illegal widen"):
        apply_changes(ts3, [SchemaChange("widen", "amt", dtype="decimal(20,4)")])


def test_widen_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    sink.evolve([SchemaChange("add", "stars", dtype="int")])
    sink.evolve([SchemaChange("widen", "stars", dtype="bigint")])
    v = sink.manifest().version
    sink.evolve([SchemaChange("widen", "stars", dtype="bigint")])  # re-apply
    assert sink.manifest().version == v  # no new snapshot minted


def test_time_travel_before_widen_sees_narrow_type(spark, tmp_path):
    """Reading AS OF a pre-widen version returns the type the snapshot
    declared — evolution is versioned metadata, not a global mutation."""
    path = str(tmp_path / "t")
    cfg = ReplayConfig(schema_evolution={0: [SchemaChange("add", "stars", dtype="int")]})
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7)],
        schema=_stars_schema(T.IntegerType()),
    )
    process_epoch(spark, sink, e0, 0, cfg)
    v_before = sink.manifest().version
    sink.evolve([SchemaChange("widen", "stars", dtype="bigint")])
    assert dict(sink.load().dtypes)["stars"] == "bigint"
    assert dict(sink.load(version=v_before).dtypes)["stars"] == "int"


def test_iceberg_sink_widen_issues_alter_column_type():
    from tests.test_iceberg_contract import FakeSpark

    from jurisprudencia_privada_etl_spark.plans.sink import IcebergSink

    fake = FakeSpark(table_columns=["repo", "path", "stars"])
    sink = IcebergSink(fake, "lake.db.t")
    sink.evolve([SchemaChange("widen", "stars", dtype="bigint")])
    assert any(
        s == "ALTER TABLE lake.db.t ALTER COLUMN stars TYPE bigint" for s in fake.statements
    )


def test_change_feed_across_widen_boundary(spark, tmp_path):
    """A feed window spanning a widen coerces the old (narrow) snapshot's
    image to the new type — consumers see one consistent schema and the
    preimage values are intact."""
    from jurisprudencia_privada_etl_spark.operators.change_feed import change_feed

    path = str(tmp_path / "t")
    cfg = ReplayConfig(
        schema_evolution={
            0: [SchemaChange("add", "stars", dtype="int")],
            1: [SchemaChange("widen", "stars", dtype="bigint")],
        }
    )
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1", 7)],
        schema=_stars_schema(T.IntegerType()),
    )
    process_epoch(spark, sink, e0, 0, cfg)
    v0 = sink.manifest().version
    big = 3_000_000_000
    e1 = spark.createDataFrame(
        [(1, 2, "U", "r1", "a.py", "c2", "py", "v1b", big)],
        schema=_stars_schema(T.LongType()),
    )
    process_epoch(spark, sink, e1, 1, cfg)
    feed = change_feed(sink, v0, sink.manifest().version)
    assert dict(feed.dtypes)["stars"] == "bigint"
    rows = {r["_change_type"]: r for r in feed.collect()}
    assert rows["update_preimage"]["stars"] == 7
    assert rows["update_postimage"]["stars"] == big

"""CDC-out: to_debezium (sources/debezium.py) — the engine's change feed
serialized as Debezium envelopes, round-tripped through parse_debezium.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.change_feed import (
    change_feed,
    feed_as_changelog,
)
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import TARGET_SCHEMA, TableSchema
from jurisprudencia_privada_etl_spark.sources.debezium import parse_debezium, to_debezium

from tests.conftest import assert_state_equal
from tests.test_fixtures import make_log


def _source_with_two_versions(spark, tmp_path):
    path = str(tmp_path / "src")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    cfg = ReplayConfig()
    e0 = [(0, 1, "I", "r1", "a.py", "c1", "py", "v1"),
          (0, 2, "I", "r1", "b.py", "c2", "ts", "v2"),
          (0, 3, "I", "r2", "c.go", "c3", "go", "v3")]
    process_epoch(spark, sink, make_log(spark, e0), 0, cfg)
    v0 = sink.manifest().version
    e1 = [(1, 4, "U", "r1", "a.py", "c4", "py", "v1-new"),
          (1, 5, "D", "r1", "b.py", None, None, None),
          (1, 6, "I", "r2", "d.go", "c6", "go", "v6")]
    process_epoch(spark, sink, make_log(spark, e1), 1, cfg)
    return sink, v0, sink.manifest().version


def test_envelope_shape_is_debezium(spark, tmp_path):
    sink, v0, v1 = _source_with_two_versions(spark, tmp_path)
    feed = change_feed(sink, v0, v1)
    rows = to_debezium(feed, db="lake", table="docs").collect()
    # 3 keys changed -> 3 envelopes (the update pair folds into one 'u')
    assert len(rows) == 3
    by_op = {}
    for r in rows:
        env = json.loads(r["value"])["payload"]
        by_op[env["op"]] = env
        assert env["source"]["db"] == "lake" and env["source"]["table"] == "docs"
        assert isinstance(env["source"]["lsn"], int)
    assert set(by_op) == {"c", "u", "d"}
    u = by_op["u"]
    assert u["before"]["content"] == "v1" and u["after"]["content"] == "v1-new"
    c = by_op["c"]
    assert "before" not in c or c["before"] is None
    assert c["after"]["path"] == "d.go"
    d = by_op["d"]
    assert d["before"]["path"] == "b.py"
    assert "after" not in d or d["after"] is None


def test_roundtrip_parse_matches_feed_as_changelog(spark, tmp_path):
    """parse_debezium(to_debezium(feed)) == feed_as_changelog(feed):
    same ops, ordinals and row images — byte-identical interchange."""
    sink, v0, v1 = _source_with_two_versions(spark, tmp_path)
    feed = change_feed(sink, v0, v1)
    direct = feed_as_changelog(feed, epoch=7)
    via_envelope = parse_debezium(
        to_debezium(feed), epoch=F.lit(7).cast("long")
    ).select(*direct.columns)
    a = {tuple(r) for r in direct.collect()}
    b = {tuple(r) for r in via_envelope.collect()}
    assert a == b and len(a) == 3


def test_replica_converges_over_the_envelope(spark, tmp_path):
    """Bootstrap a replica at v0, ship the v0→v1 delta as Debezium JSON,
    replay it: replica state == source state (content sha included)."""
    sink, v0, v1 = _source_with_two_versions(spark, tmp_path)
    rpath = str(tmp_path / "replica")
    replica = HadoopParquetSink(spark, rpath)
    replica.create(TableSchema.from_struct(TARGET_SCHEMA))
    cfg = ReplayConfig()
    from jurisprudencia_privada_etl_spark.operators.change_feed import snapshot_as_changelog

    process_epoch(spark, replica, snapshot_as_changelog(sink, epoch=0, version=v0), 0, cfg)
    wire = to_debezium(change_feed(sink, v0, v1))
    events = parse_debezium(wire, epoch=F.lit(1).cast("long"))
    process_epoch(spark, replica, events, 1, cfg)
    assert_state_equal(sink.load().toPandas(), replica.load().toPandas())

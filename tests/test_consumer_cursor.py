"""Consumer-group cursors for CDC-out (operators/change_feed.py):
per-consumer shipped-version offsets with a bootstrap-by-diff-from-empty
first window, monotonic advance, and crash-window idempotence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.change_feed import (
    advance_consumer,
    consumer_cursor,
    feed_as_changelog,
    feed_for_consumer,
)
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import TARGET_SCHEMA, TableSchema

from tests.conftest import assert_state_equal
from tests.test_fixtures import make_log


def _sink(spark, tmp_path, name="src"):
    s = HadoopParquetSink(spark, str(tmp_path / name))
    s.create(TableSchema.from_struct(TARGET_SCHEMA))
    return s


def test_first_window_bootstraps_full_state(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    process_epoch(
        spark, sink,
        make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1"),
                         (0, 2, "I", "r1", "b.py", "c2", "ts", "v2"),
                         (0, 3, "D", "r1", "b.py", None, None, None)]),
        0, ReplayConfig(),
    )
    assert consumer_cursor(sink, "replica-eu") is None
    feed, v_from, v_to = feed_for_consumer(sink, "replica-eu")
    rows = feed.collect()
    # only the live row ships; the already-dead key emits nothing
    assert v_from == 0 and v_to == sink.manifest().version
    assert [(r["path"], r["_change_type"]) for r in rows] == [("a.py", "insert")]


def test_incremental_window_and_monotonic_advance(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    process_epoch(spark, sink,
                  make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1")]),
                  0, ReplayConfig())
    _, _, v1 = feed_for_consumer(sink, "c")
    advance_consumer(sink, "c", v1)
    assert consumer_cursor(sink, "c") == v1
    # caught up: no feed
    feed, a, b = feed_for_consumer(sink, "c")
    assert feed is None and a == b == v1
    process_epoch(spark, sink,
                  make_log(spark, [(1, 2, "U", "r1", "a.py", "c2", "py", "v1b")]),
                  1, ReplayConfig())
    feed, v_from, v_to = feed_for_consumer(sink, "c")
    assert v_from == v1 and v_to > v1
    kinds = {r["_change_type"] for r in feed.collect()}
    assert kinds == {"update_preimage", "update_postimage"}
    with pytest.raises(ValueError, match="refusing rewind"):
        advance_consumer(sink, "c", v1 - 1)


def test_crash_between_ship_and_advance_converges(spark, tmp_path):
    """Ship a window, 'crash' before advancing, re-ship the same window,
    apply BOTH shipments to the replica: state still converges (the LWW
    ordinal guard absorbs the duplicate — at-least-once shipping,
    exactly-once effect)."""
    sink = _sink(spark, tmp_path)
    process_epoch(spark, sink,
                  make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1"),
                                   (0, 2, "I", "r2", "b.go", "c2", "go", "v2")]),
                  0, ReplayConfig())
    replica = _sink(spark, tmp_path, "replica")
    feed1, _, v_to = feed_for_consumer(sink, "r")
    process_epoch(spark, replica, feed_as_changelog(feed1, epoch=0), 0, ReplayConfig())
    # crash: cursor NOT advanced; the re-run recomputes the same window
    feed2, v_from2, v_to2 = feed_for_consumer(sink, "r")
    assert (v_from2, v_to2) == (0, v_to)
    process_epoch(spark, replica, feed_as_changelog(feed2, epoch=1), 1, ReplayConfig())
    advance_consumer(sink, "r", v_to2)
    assert_state_equal(sink.load().toPandas(), replica.load().toPandas())
    # independent consumers keep independent cursors
    assert consumer_cursor(sink, "r") == v_to2
    assert consumer_cursor(sink, "other") is None

"""Multi-table atomic commits (plans/txn.py): all-or-nothing visibility
across tables fed from one changelog epoch, with a crash injected at every
protocol boundary — before the commit point (roll back), after it (roll
forward), and mid roll-forward (finish the tail)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.plans import manifest as mf
from jurisprudencia_privada_etl_spark.plans import txn
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, prepare_epoch_updates
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import TARGET_SCHEMA, TableSchema
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import assert_state_equal, oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]
CFG = ReplayConfig(n_buckets=8)


def _route(df, left: bool):
    """Deterministic two-way fan-out by repo hash parity."""
    pred = F.pmod(F.xxhash64("repo"), F.lit(2)) == F.lit(0 if left else 1)
    return df.where(pred)


def _setup(spark, tmp_path, epochs=2, n=1500, seed=47):
    log = synthetic_changelog(
        spark, n, seed=seed, n_epochs=epochs, n_repos=8, paths_per_repo=40,
        pct_update=0.4, pct_delete=0.15,
    )
    sinks = []
    for name in ("a", "b"):
        s = HadoopParquetSink(spark, str(tmp_path / name), n_buckets=CFG.n_buckets)
        s.create(TableSchema.from_struct(TARGET_SCHEMA))
        sinks.append(s)
    return log, sinks


def _parts(spark, log, sinks, epoch):
    payload = [c.name for c in sinks[0].manifest().schema.columns]
    batch = log.where(F.col("epoch") == epoch)
    return [
        (sinks[0], prepare_epoch_updates(spark, _route(batch, True), CFG, payload), epoch),
        (sinks[1], prepare_epoch_updates(spark, _route(batch, False), CFG, payload), epoch),
    ]


def test_commit_makes_both_visible_and_is_exactly_once(spark, tmp_path):
    log, sinks = _setup(spark, tmp_path)
    pdf = log.toPandas()
    root = str(tmp_path)
    for epoch in (0, 1):
        r = txn.multi_table_commit(root, _parts(spark, log, sinks, epoch))
        assert r["txn_id"] is not None
    # both tables at epoch 1, each holding its route's oracle state
    whole = oracle_reduce(pdf)
    got_a = sinks[0].load().select(*PAYLOAD).toPandas()
    got_b = sinks[1].load().select(*PAYLOAD).toPandas()
    assert sinks[0].last_committed_epoch() == 1 == sinks[1].last_committed_epoch()
    # routes are disjoint and complete
    ka = set(map(tuple, got_a[["repo", "path"]].values))
    kb = set(map(tuple, got_b[["repo", "path"]].values))
    assert not (ka & kb)
    union = (
        pd.concat([got_a, got_b])
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert_state_equal(union, whole)
    # exactly-once inside the transaction: re-running the epoch is a no-op
    r = txn.multi_table_commit(root, _parts(spark, log, sinks, 1))
    assert r["txn_id"] is None
    assert all(v.get("skipped") for v in r["tables"].values())


def test_crash_before_commit_point_rolls_back(spark, tmp_path):
    log, sinks = _setup(spark, tmp_path, epochs=1)
    root = str(tmp_path)
    v_before = [mf.current_version(s.table_path) for s in sinks]
    # PREPARE only — the driver dies before the record is published
    for sink, updates, epoch in _parts(spark, log, sinks, 0):
        r = sink.merge(updates, epoch, stage=True)
        assert not r.get("skipped")
    assert all(s.staged() is not None for s in sinks)
    rep = txn.recover(root, sinks)
    assert sorted(rep["rolled_back"]) == sorted(s.table_path for s in sinks)
    assert rep["rolled_forward"] == []
    for s, v in zip(sinks, v_before):
        assert mf.current_version(s.table_path) == v
        assert s.staged() is None
        assert s.load().count() == 0
        # the aborted attempts' data dirs are reclaimed
        data = os.path.join(s.table_path, "data")
        dirs = os.listdir(data) if os.path.isdir(data) else []
        assert all(not d.startswith("v00000001") for d in dirs), dirs


def test_crash_after_commit_point_rolls_forward(spark, tmp_path):
    log, sinks = _setup(spark, tmp_path, epochs=1)
    pdf = log.toPandas()
    root = str(tmp_path)
    staged = {}
    for sink, updates, epoch in _parts(spark, log, sinks, 0):
        sink.merge(updates, epoch, stage=True)
        s = mf.load_staged(sink.table_path)
        staged[sink.table_path] = {
            "staged_version": s.version, "parent_version": s.parent_version, "epoch": 0,
        }
    txn._publish_record(root, 0, staged)  # commit point reached, then crash
    rep = txn.recover(root, sinks)
    assert sorted(rep["rolled_forward"]) == sorted(s.table_path for s in sinks)
    assert rep["rolled_back"] == []
    union = pd.concat(
        [s.load().select(*PAYLOAD).toPandas() for s in sinks]
    ).sort_values(["repo", "path"]).reset_index(drop=True)
    assert_state_equal(union, oracle_reduce(pdf))
    # recovery is idempotent
    rep2 = txn.recover(root, sinks)
    assert rep2 == {"rolled_forward": [], "rolled_back": []}


def test_crash_mid_roll_forward_finishes_the_tail(spark, tmp_path):
    log, sinks = _setup(spark, tmp_path, epochs=1)
    pdf = log.toPandas()
    root = str(tmp_path)
    staged = {}
    for sink, updates, epoch in _parts(spark, log, sinks, 0):
        sink.merge(updates, epoch, stage=True)
        s = mf.load_staged(sink.table_path)
        staged[sink.table_path] = {
            "staged_version": s.version, "parent_version": s.parent_version, "epoch": 0,
        }
    txn._publish_record(root, 0, staged)
    sinks[0].publish_staged()  # one table promoted, then crash
    rep = txn.recover(root, sinks)
    assert rep["rolled_forward"] == [sinks[1].table_path]
    union = pd.concat(
        [s.load().select(*PAYLOAD).toPandas() for s in sinks]
    ).sort_values(["repo", "path"]).reset_index(drop=True)
    assert_state_equal(union, oracle_reduce(pdf))


def test_read_at_returns_the_transactional_cut(spark, tmp_path):
    """After a later NON-transactional merge advances one table, read_at
    still hands out the version pair pinned by the last done transaction —
    a cross-table state that actually existed."""
    log, sinks = _setup(spark, tmp_path)
    pdf = log.toPandas()
    root = str(tmp_path)
    txn.multi_table_commit(root, _parts(spark, log, sinks, 0))
    cut = txn.read_at(root, sinks)
    # table A takes epoch 1 OUTSIDE the coordinator
    sink_a, updates, epoch = _parts(spark, log, sinks, 1)[0]
    sink_a.merge(updates, epoch)
    assert sink_a.last_committed_epoch() == 1
    # the cut still reads both tables at the post-epoch-0 transaction state
    cut2 = txn.read_at(root, sinks)
    assert cut2 == cut
    e0 = oracle_reduce(pdf[pdf["epoch"] <= 0])
    union = pd.concat(
        [s.load(version=cut2[s.table_path]).select(*PAYLOAD).toPandas() for s in sinks]
    ).sort_values(["repo", "path"]).reset_index(drop=True)
    assert_state_equal(union, e0)

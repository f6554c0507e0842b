"""Merge-on-read write mode (write_mode="mor").

Each epoch appends per-bucket delta files instead of rewriting touched
buckets; ``load`` resolves base+deltas with a per-key LWW window and
``compact()`` folds the deltas back into a plain base.  These tests pin:

  * final-state equivalence with copy-on-write (same changelog, both
    modes, row-for-row incl. content_sha) — and against the independent
    pandas oracle;
  * per-epoch metric parity (created/updated/deleted/kept) with CoW;
  * exactly-once re-run no-op;
  * stale out-of-order events lose and deletes cannot be resurrected;
  * compact() folds deltas, preserves state, keeps time travel working;
  * vacuum / expire_snapshots / change_feed over delta-bearing tables;
  * schema evolution between base and delta writes (column-id mapping).

Reference semantics: the upsert is the deterministic-id insert-or-replace
of src/juris.ts:6-14; MoR only changes the physical write strategy.
"""

from __future__ import annotations

import pandas as pd
import pytest

from jurisprudencia_privada_etl_spark.operators.change_feed import change_feed
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.schemas import SchemaChange
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import assert_state_equal, oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]

MOR = ReplayConfig(write_mode="mor")


def _state(sink) -> pd.DataFrame:
    return sink.load().select(*PAYLOAD).toPandas()


def _merge_counts(sink) -> list[dict]:
    return [
        {k: s["metrics"][k] for k in ("epoch", "created", "updated", "deleted", "kept")}
        for s in sink.snapshots()
        if s["operation"] == "merge"
    ]


def _delta_entries(sink) -> dict[str, list]:
    return {
        b: e["deltas"]
        for b, e in sink.manifest().buckets.items()
        if e.get("deltas")
    }


def test_mor_matches_cow_and_oracle(spark, tmp_path):
    """Same changelog through both write modes: identical final state
    (incl. sha256 invariant), identical per-epoch merge metrics, and the
    MoR table actually carries deltas (the mode was exercised)."""
    log = synthetic_changelog(
        spark, 3000, seed=31, n_epochs=4, n_repos=10, paths_per_repo=80,
        pct_update=0.4, pct_delete=0.15, shuffle_within_epoch=True,
    )
    pdf = log.toPandas()
    cow = replay_dataframe(spark, log, str(tmp_path / "cow"))
    mor = replay_dataframe(spark, log, str(tmp_path / "mor"), MOR)
    assert _delta_entries(mor), "mor replay produced no delta entries"
    assert not _delta_entries(cow)
    assert_state_equal(_state(mor), oracle_reduce(pdf))
    assert_state_equal(_state(mor), _state(cow))
    assert _merge_counts(mor) == _merge_counts(cow)


def test_mor_exactly_once_rerun(spark, tmp_path):
    log = synthetic_changelog(spark, 800, seed=5, n_epochs=2, n_repos=5,
                              paths_per_repo=40, pct_delete=0.2)
    path = str(tmp_path / "t")
    s1 = replay_dataframe(spark, log, path, MOR)
    v1 = s1.manifest().version
    first = _state(s1)
    s2 = replay_dataframe(spark, log, path, MOR)
    assert s2.manifest().version == v1  # no new snapshot — replays skipped
    assert_state_equal(_state(s2), first)


def test_mor_stale_events_lose_and_deletes_stick(spark, tmp_path):
    """Out-of-order arrivals across epochs: a lower-ordinal update arriving
    after a higher-ordinal row (or after a delete) must lose at read time —
    the delta is filtered at write, and resolution prefers max ordinal."""
    rows = [
        # epoch 0: insert k1@10, insert k2@11, delete k2@12
        (0, 10, "I", "r1", "a.py", "c10", "py", "v10"),
        (0, 11, "I", "r1", "b.py", "c11", "py", "v11"),
        (0, 12, "D", "r1", "b.py", "c12", "py", None),
        # epoch 1: STALE update k1@5 (loses), STALE resurrect k2@6 (loses),
        # fresh update k1@20 (wins)
        (1, 5, "U", "r1", "a.py", "c5", "py", "stale"),
        (1, 6, "U", "r1", "b.py", "c6", "py", "resurrect"),
        (1, 20, "U", "r1", "a.py", "c20", "py", "v20"),
    ]
    from jurisprudencia_privada_etl_spark.schemas import CHANGELOG_SCHEMA

    log = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    sink = replay_dataframe(spark, log, str(tmp_path / "t"), MOR)
    got = _state(sink).set_index("path")
    assert list(got.index) == ["a.py"]  # b.py stays deleted
    assert got.loc["a.py", "content"] == "v20"
    assert got.loc["a.py", "ordinal"] == 20
    # the tombstone is retained (protects against future stale resurrects)
    with_tombs = sink.load(include_tombstones=True).toPandas()
    assert len(with_tombs) == 2


def test_mor_compact_folds_deltas(spark, tmp_path):
    log = synthetic_changelog(
        spark, 2000, seed=13, n_epochs=3, n_repos=8, paths_per_repo=60,
        pct_update=0.4, pct_delete=0.1,
    )
    sink = replay_dataframe(spark, log, str(tmp_path / "t"), MOR)
    before = _state(sink)
    v_before = sink.manifest().version
    epoch_before = sink.manifest().last_committed_epoch
    assert _delta_entries(sink)
    res = sink.compact()
    assert res["compacted_buckets"] > 0
    assert not _delta_entries(sink), "compact left delta refs behind"
    assert_state_equal(_state(sink), before)
    # pre-compaction snapshot still time-travels (delta resolution at old version)
    assert_state_equal(
        sink.load(version=v_before).select(*PAYLOAD).toPandas(), before
    )
    # epoch counter untouched — replay resumes where it was
    assert sink.manifest().last_committed_epoch == epoch_before


def test_mor_vacuum_drops_expired_tombstones(spark, tmp_path):
    log = synthetic_changelog(spark, 1500, seed=17, n_epochs=2, n_repos=6,
                              paths_per_repo=50, pct_update=0.3, pct_delete=0.3)
    sink = replay_dataframe(spark, log, str(tmp_path / "t"), MOR)
    before = _state(sink)
    tombs = sink.load(include_tombstones=True).where("deleted").count()
    assert tombs > 0
    max_ord = int(log.agg({"ordinal": "max"}).first()[0])
    res = sink.vacuum(max_ord + 1)
    assert res["vacuumed_buckets"] > 0
    assert sink.load(include_tombstones=True).where("deleted").count() == 0
    assert_state_equal(_state(sink), before)


def test_mor_expire_snapshots_keeps_current_readable(spark, tmp_path):
    log = synthetic_changelog(spark, 1200, seed=19, n_epochs=3, n_repos=6,
                              paths_per_repo=50, pct_update=0.3, pct_delete=0.1)
    sink = replay_dataframe(spark, log, str(tmp_path / "t"), MOR)
    before = _state(sink)
    res = sink.expire_snapshots(keep_last=1)
    # current snapshot references base AND delta dirs across several write
    # versions — none may be GC'd
    assert_state_equal(_state(sink), before)
    assert res["expired_manifests"] >= 0


def test_mor_change_feed_prunes_and_diffs(spark, tmp_path):
    """A delta append changes the bucket's manifest entry, so the feed's
    metadata pruning detects it; both snapshot reads resolve deltas."""
    log = synthetic_changelog(spark, 1500, seed=23, n_epochs=2, n_repos=6,
                              paths_per_repo=50, pct_update=0.4, pct_delete=0.1)
    pdf = log.toPandas()
    path = str(tmp_path / "t")
    s0 = replay_dataframe(spark, log.where("epoch = 0"), path, MOR)
    v0 = s0.manifest().version
    sink = replay_dataframe(spark, log, path, MOR)
    feed = change_feed(sink, v0)
    kinds = {r["_change_type"] for r in feed.select("_change_type").distinct().collect()}
    assert kinds <= {"insert", "delete", "update_preimage", "update_postimage"}
    # applying epoch-1 over the epoch-0 oracle state must land on the full oracle
    e0 = oracle_reduce(pdf[pdf["epoch"] == 0])
    full = oracle_reduce(pdf)
    changed = feed.count()
    assert changed > 0
    # inserts+updates+deletes in the feed account exactly for the state diff
    ins = feed.where("_change_type = 'insert'").count()
    upd = feed.where("_change_type = 'update_postimage'").count()
    dele = feed.where("_change_type = 'delete'").count()
    assert len(full) == len(e0) + ins - dele
    assert upd <= len(e0)


def test_mor_schema_evolution_across_delta_boundary(spark, tmp_path):
    """Base written before an add/rename evolution, deltas after: the
    resolution read maps every file set by column id (old files null-fill
    the added column, renamed columns alias to the new name) — same
    guarantee as the CoW fixture test_schema_evolution_add_and_rename,
    exercised through the delta-resolution window."""
    import pandas as pd
    from pyspark.sql import types as T

    from jurisprudencia_privada_etl_spark.plans.replay import process_epoch
    from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
    from jurisprudencia_privada_etl_spark.schemas import (
        CHANGELOG_SCHEMA,
        TableSchema,
        TARGET_SCHEMA,
    )
    from tests.conftest import sha256_hex

    cfg = ReplayConfig(
        write_mode="mor",
        schema_evolution={
            1: [SchemaChange("add", "stars", dtype="int")],
            2: [SchemaChange("rename", "lang", new_name="language")],
        },
    )
    sink = HadoopParquetSink(spark, str(tmp_path / "t"), write_mode="mor")
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))

    e0 = spark.createDataFrame(
        [(0, 1, "I", "r1", "a.py", "c1", "py", "v1"),
         (0, 2, "I", "r1", "b.py", "c2", "ts", "v2")],
        CHANGELOG_SCHEMA,
    )
    process_epoch(spark, sink, e0, 0, cfg)

    ev_schema = T.StructType(
        list(CHANGELOG_SCHEMA.fields) + [T.StructField("stars", T.IntegerType(), True)]
    )
    e1 = spark.createDataFrame([(1, 3, "I", "r1", "c.py", "c3", "go", "v3", 7)], ev_schema)
    process_epoch(spark, sink, e1, 1, cfg)
    e2 = spark.createDataFrame([(2, 4, "U", "r1", "a.py", "c4", "py", "v1-new", 9)], ev_schema)
    process_epoch(spark, sink, e2, 2, cfg)

    assert _delta_entries(sink), "evolution test never crossed a delta boundary"
    out = sink.load().orderBy("path").toPandas()
    assert list(sink.manifest().schema.names()) == [
        "repo", "path", "commit", "language", "content", "stars"
    ]
    assert list(out["path"]) == ["a.py", "b.py", "c.py"]
    b = out[out["path"] == "b.py"].iloc[0]  # pre-evolution base row
    assert pd.isna(b["stars"]) and b["language"] == "ts"
    c = out[out["path"] == "c.py"].iloc[0]  # post-add delta row
    assert c["stars"] == 7 and c["language"] == "go"
    a = out[out["path"] == "a.py"].iloc[0]  # updated across the rename
    assert a["stars"] == 9 and a["content"] == "v1-new"
    assert a["content_sha"] == sha256_hex("v1-new")


def test_mor_crash_before_publish_is_invisible(spark, tmp_path):
    """Delta files written but manifest not published → table unchanged;
    re-running the epoch applies it exactly once."""
    log = synthetic_changelog(spark, 900, seed=37, n_epochs=2, n_repos=5,
                              paths_per_repo=40, pct_update=0.3, pct_delete=0.1)
    pdf = log.toPandas()
    path = str(tmp_path / "t")
    s0 = replay_dataframe(spark, log.where("epoch = 0"), path, MOR)
    state0 = _state(s0)
    s0.crash_before_publish = True
    from jurisprudencia_privada_etl_spark.plans.replay import process_epoch

    with pytest.raises(RuntimeError, match="injected crash"):
        process_epoch(spark, s0, log.where("epoch = 1"), 1, MOR)
    assert s0.last_committed_epoch() == 0
    assert_state_equal(_state(s0), state0)
    s0.crash_before_publish = False
    process_epoch(spark, s0, log.where("epoch = 1"), 1, MOR)
    assert s0.last_committed_epoch() == 1
    assert_state_equal(_state(s0), oracle_reduce(pdf))

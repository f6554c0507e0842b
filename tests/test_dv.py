"""Position-delete deletion vectors (sink.dv_delete) — Iceberg v2
position-delete / Delta deletion-vector analog.

The contract under test: dv_delete removes rows from every reader's view
WITHOUT rewriting any data file (the delete writes kilobytes on a table of
any size), the deleted positions read as payload-free tombstones at the
delete ordinal (so the LWW merge guard, change feeds and replication all
compose unchanged), and compact()/vacuum() fold the DV back into a clean
physical rewrite.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.change_feed import (
    change_feed,
    feed_as_changelog,
    snapshot_as_changelog,
)
from jurisprudencia_privada_etl_spark.operators.fsck import fsck, table_digest
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

PRED = "length(content) % 5 = 0"


def _log(spark, seed=311, n=1500, epochs=2):
    return synthetic_changelog(
        spark, n, seed=seed, n_epochs=epochs, n_repos=6, paths_per_repo=40,
        pct_update=0.4, pct_delete=0.1,
    )


def _parquet_set(table_path: str) -> set[str]:
    return {
        os.path.relpath(p, table_path)
        for p in glob.glob(os.path.join(table_path, "data", "**", "*.parquet"),
                           recursive=True)
    }


def _digests_equal(a, b, cols) -> bool:
    ra = table_digest(a.select(*cols), cols).collect()[0]
    rb = table_digest(b.select(*cols), cols).collect()[0]
    return (
        ra["n_rows"] == rb["n_rows"]
        and ra["digest_xor"] == rb["digest_xor"]
        and ra["digest_sum"] == rb["digest_sum"]
    )


def test_dv_delete_matches_delete_where_state_without_rewriting_data(spark, tmp_path):
    log = _log(spark)
    head = log.agg(F.max("ordinal")).collect()[0][0]
    dv_sink = replay_dataframe(spark, log, str(tmp_path / "dv"))
    rw_sink = replay_dataframe(spark, log, str(tmp_path / "rw"))

    n_match = dv_sink.load().where(F.expr(PRED)).count()
    assert n_match > 0
    before_files = _parquet_set(dv_sink.table_path)

    r_dv = dv_sink.dv_delete(PRED, ordinal=head + 1)
    r_rw = rw_sink.delete_where(PRED, ordinal=head + 1)
    assert r_dv["dv_rows"] == n_match == r_rw["purged_rows"]

    # no pre-existing data file was rewritten or removed; the commit added
    # ONLY the (file, pos) delete sets — and they are tiny
    after_files = _parquet_set(dv_sink.table_path)
    assert before_files <= after_files
    new_files = after_files - before_files
    assert new_files
    for rel in new_files:
        md = pq.read_metadata(os.path.join(dv_sink.table_path, rel))
        assert {c for c in md.schema.names} == {"file", "pos"}
    dv_bytes = sum(
        os.path.getsize(os.path.join(dv_sink.table_path, rel)) for rel in new_files
    )
    data_bytes = sum(
        os.path.getsize(os.path.join(dv_sink.table_path, rel)) for rel in before_files
    )
    assert dv_bytes < data_bytes / 10

    # both deletion mechanisms converge to the same logical table: live
    # rows AND the tombstones they leave behind (ordinal + nulled payload)
    cols = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]
    assert _digests_equal(dv_sink.load(), rw_sink.load(), cols)
    assert _digests_equal(
        dv_sink.load(include_tombstones=True),
        rw_sink.load(include_tombstones=True),
        cols + ["deleted"],
    )

    # fsck audits DV refs like data refs and still passes
    report = fsck(dv_sink)
    assert report["ok"], report

    # idempotent: nothing live matches anymore
    v = dv_sink.manifest().version
    assert dv_sink.dv_delete(PRED, ordinal=head + 2) == {"dv_rows": 0, "dv_buckets": 0}
    assert dv_sink.manifest().version == v


def test_stale_event_loses_to_dv_tombstone_and_fresh_event_wins(spark, tmp_path):
    log = _log(spark, seed=313)
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    head = log.agg(F.max("ordinal")).collect()[0][0]
    victim = sink.load().select("repo", "path").orderBy("repo", "path").first()
    key_pred = (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])

    sink.dv_delete(key_pred, ordinal=head + 10)
    assert sink.load().where(key_pred).count() == 0

    def _event(ordinal, epoch):
        return spark.createDataFrame(
            [(victim["repo"], victim["path"], "c-late", "py", "late content",
              ordinal, "U", epoch)],
            "repo string, path string, commit string, lang string, "
            "content string, ordinal long, op string, epoch int",
        )

    # stale pre-delete event (ordinal below the DV tombstone): must lose
    replay_dataframe(spark, _event(head + 5, 2), sink.table_path)
    assert sink.load().where(key_pred).count() == 0

    # fresh post-delete event: must resurrect the key (normal LWW)
    replay_dataframe(spark, _event(head + 20, 3), sink.table_path)
    row = sink.load().where(key_pred).collect()
    assert len(row) == 1 and row[0]["content"] == "late content"


def test_dv_composes_with_mor_delta_stacks(spark, tmp_path):
    log = _log(spark, seed=317, epochs=3)
    head = log.agg(F.max("ordinal")).collect()[0][0]
    mor = replay_dataframe(
        spark, log, str(tmp_path / "mor"), ReplayConfig(write_mode="mor")
    )
    cow = replay_dataframe(spark, log, str(tmp_path / "cow"))
    assert any(e.get("deltas") for e in mor.manifest().buckets.values())

    mor.dv_delete(PRED, ordinal=head + 1)
    cow.dv_delete(PRED, ordinal=head + 1)
    cols = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]
    assert _digests_equal(mor.load(), cow.load(), cols)

    # compact folds deltas AND DVs into a clean base: same logical state,
    # no dv refs left, and the deleted rows' bytes are gone from disk
    mor.compact()
    assert not any(e.get("dvs") or e.get("deltas")
                   for e in mor.manifest().buckets.values())
    assert _digests_equal(mor.load(), cow.load(), cols)
    assert _digests_equal(
        mor.load(include_tombstones=True),
        cow.load(include_tombstones=True),
        cols + ["deleted"],
    )


def test_vacuum_folds_dv_tombstones_past_horizon(spark, tmp_path):
    log = _log(spark, seed=331)
    head = log.agg(F.max("ordinal")).collect()[0][0]
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    r = sink.dv_delete(PRED, ordinal=head + 1)
    assert r["dv_rows"] > 0
    live_before = sink.load().count()

    sink.vacuum(retain_after_ordinal=head + 2)
    assert sink.load().count() == live_before
    assert (
        sink.load(include_tombstones=True)
        .where(F.col("deleted") & (F.col("ordinal") == head + 1))
        .count()
        == 0
    )
    # every DV'd bucket got rewritten by the vacuum, clearing its dv refs
    assert not any(e.get("dvs") for e in sink.manifest().buckets.values())


def test_gc_protects_referenced_dv_files(spark, tmp_path):
    log = _log(spark, seed=337, epochs=3)
    head = log.agg(F.max("ordinal")).collect()[0][0]
    sink = replay_dataframe(
        spark, log.where(F.col("epoch") < 2), str(tmp_path / "t")
    )
    victims = sink.load().where(F.expr(PRED)).select("repo", "path")
    victims_pd = victims.toPandas()
    assert len(victims_pd) > 0
    sink.dv_delete(PRED, ordinal=head + 1)
    # a later epoch merges on top; CoW rewrites touched buckets (folding
    # their DVs) but untouched buckets keep dv refs
    replay_dataframe(spark, log.where(F.col("epoch") == 2), sink.table_path)

    sink.expire_snapshots(keep_last=1)
    sink.remove_orphan_files(older_than_s=0.0)
    # still-referenced DV files survived both GC passes: every DV'd key
    # stays deleted (epoch-2 ordinals are all below the DV tombstone's,
    # so none can win it back) and fsck finds every ref on disk
    victims_df = spark.createDataFrame(victims_pd)
    assert sink.load().join(victims_df, ["repo", "path"], "semi").count() == 0
    report = fsck(sink)
    assert report["ok"], report


def test_change_feed_carries_dv_deletes_and_replica_converges(spark, tmp_path):
    log = _log(spark, seed=347)
    head = log.agg(F.max("ordinal")).collect()[0][0]
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    v0 = sink.manifest().version
    r = sink.dv_delete(PRED, ordinal=head + 1)
    v1 = sink.manifest().version

    feed = change_feed(sink, from_version=v0, to_version=v1)
    dels = feed.where(F.col("_change_type") == "delete")
    assert dels.count() == r["dv_rows"]
    assert dels.where(F.col("ordinal") != head + 1).count() == 0

    # bootstrap a replica at v0, apply the feed: converges to the DV state
    replica = replay_dataframe(
        spark,
        snapshot_as_changelog(sink, version=v0, epoch=0),
        str(tmp_path / "replica"),
    )
    replay_dataframe(spark, feed_as_changelog(feed, epoch=1), replica.table_path)
    cols = ["repo", "path", "commit", "lang", "content", "content_sha"]
    assert _digests_equal(sink.load(), replica.load(), cols)

"""Targeted purge (delete_where) — right-to-be-forgotten semantics.

The hard guarantee is the last test: after the documented three-step
erasure recipe, the secret value appears in NO readable byte of NO parquet
file under the table — verified by decoding every file on disk, not by
trusting the reader API.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.change_feed import (
    change_feed,
    feed_as_changelog,
    snapshot_as_changelog,
)
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

SECRET = "xxsecretxx"


def _log(spark, seed=83, n=1500, epochs=2):
    return synthetic_changelog(
        spark, n, seed=seed, n_epochs=epochs, n_repos=6, paths_per_repo=40,
        pct_update=0.4, pct_delete=0.1,
    )


def _with_secret(log):
    """Plant the secret into a deterministic subset of contents."""
    tainted = F.pmod(F.col("ordinal"), F.lit(7)) == 0
    return log.withColumn(
        "content",
        F.when(tainted, F.concat(F.col("content"), F.lit(" " + SECRET)))
        .otherwise(F.col("content")),
    )


def test_delete_where_tombstones_matching_rows_and_is_idempotent(spark, tmp_path):
    log = _with_secret(_log(spark))
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    head = log.agg(F.max("ordinal")).collect()[0][0]
    before = sink.load().count()
    n_secret = sink.load().where(F.col("content").contains(SECRET)).count()
    assert n_secret > 0

    r = sink.delete_where(F.col("content").contains(SECRET), ordinal=head + 1)
    assert r["purged_rows"] == n_secret
    after = sink.load()
    assert after.count() == before - n_secret
    assert after.where(F.col("content").contains(SECRET)).count() == 0
    # the purge tombstones carry NO payload even before vacuum
    stones = sink.load(include_tombstones=True).where(
        F.col("deleted") & (F.col("ordinal") == head + 1)
    )
    assert stones.count() == n_secret
    assert stones.where(F.col("content").isNotNull()).count() == 0
    assert stones.where(F.col("content_sha").isNotNull()).count() == 0

    # idempotent: nothing live matches anymore → no new snapshot
    v = sink.manifest().version
    assert sink.delete_where("content LIKE '%" + SECRET + "%'", ordinal=head + 2) == {
        "purged_rows": 0, "purged_buckets": 0
    }
    assert sink.manifest().version == v


def test_stale_pre_purge_event_cannot_resurrect(spark, tmp_path):
    """An event buffered from before the purge (lower ordinal) replaying
    afterwards must lose to the purge tombstone."""
    log = _with_secret(_log(spark, seed=89))
    sink = replay_dataframe(spark, log.where(F.col("epoch") == 0), str(tmp_path / "t"))
    head = log.agg(F.max("ordinal")).collect()[0][0]
    victim = (
        sink.load().where(F.col("content").contains(SECRET))
        .select("repo", "path").first()
    )
    sink.delete_where(F.col("content").contains(SECRET), ordinal=head + 1)
    # epoch 1 still carries pre-purge events for the victim's cohort
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    risen = sink.load().where(
        (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])
    )
    assert risen.count() == 0, "stale pre-purge event resurrected a purged key"


def test_purge_propagates_to_replica_via_feed(spark, tmp_path):
    log = _with_secret(_log(spark, seed=97))
    src = replay_dataframe(spark, log, str(tmp_path / "src"))
    v0 = src.manifest().version
    replica = replay_dataframe(
        spark, snapshot_as_changelog(src, epoch=0), str(tmp_path / "dst")
    )
    head = log.agg(F.max("ordinal")).collect()[0][0]
    src.delete_where(F.col("content").contains(SECRET), ordinal=head + 1)
    inc = feed_as_changelog(change_feed(src, v0), epoch=1)
    replica = replay_dataframe(spark, inc, str(tmp_path / "dst"))
    a = src.load().select("repo", "path", "ordinal").toPandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    b = replica.load().select("repo", "path", "ordinal").toPandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert replica.load().where(F.col("content").contains(SECRET)).count() == 0


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_full_erasure_leaves_no_trace_on_disk(spark, tmp_path, write_mode):
    """delete_where → vacuum → expire_snapshots: decode EVERY parquet file
    left under the table and assert the secret is in none of them."""
    log = _with_secret(_log(spark, seed=101))
    table = str(tmp_path / "t")
    sink = replay_dataframe(spark, log, table, ReplayConfig(write_mode=write_mode))
    head = log.agg(F.max("ordinal")).collect()[0][0]

    def disk_hits() -> int:
        hits = 0
        for f in glob.glob(os.path.join(table, "**", "*.parquet"), recursive=True):
            t = pq.read_table(f)
            for col in t.column_names:
                if t.schema.field(col).type == "string":
                    s = t.column(col).to_pandas().dropna()
                    hits += int(s.str.contains(SECRET, regex=False).sum())
        return hits

    assert disk_hits() > 0
    sink.delete_where(F.col("content").contains(SECRET), ordinal=head + 1)
    sink.vacuum(retain_after_ordinal=head + 2)
    # MoR: a SUPERSEDED pre-purge row version can linger invisibly inside a
    # delta-stacked bucket's base file (its key's resolved row no longer
    # matches the predicate); folding the stacks rewrites resolved rows only
    sink.compact()
    sink.expire_snapshots(keep_last=1)
    assert disk_hits() == 0, "purged bytes still decodable somewhere under the table"
    # and the table still works: a later epoch merges fine
    more = synthetic_changelog(spark, 300, seed=103, n_epochs=1, n_repos=6,
                               paths_per_repo=40).withColumn(
        "epoch", F.lit(2).cast("long")
    ).withColumn("ordinal", F.col("ordinal") + head + 10)
    sink = replay_dataframe(spark, more, table, ReplayConfig(write_mode=write_mode))
    assert sink.last_committed_epoch() == 2

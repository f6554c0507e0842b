"""Rollback / restore: move the table head back to an earlier snapshot as a
NEW metadata-only commit (Delta RESTORE / Iceberg rollback_to_snapshot).

The reprocess-from-snapshot recipe the north rule's resumability implies:
a bad deploy writes epochs k+1..n → rollback to the epoch-k snapshot →
fix → replay re-applies the tail exactly-once."""

from __future__ import annotations

import pytest

from jurisprudencia_privada_etl_spark.plans.replay import replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import assert_state_equal, oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]


def _table(spark, tmp_path, epochs=4):
    log = synthetic_changelog(
        spark, 3000, seed=57, n_epochs=epochs, n_repos=8, paths_per_repo=60,
        pct_update=0.4, pct_delete=0.15,
    )
    return log, log.toPandas(), replay_dataframe(spark, log, str(tmp_path / "t"))


def _merge_versions(sink) -> dict[int, int]:
    return {
        s["last_committed_epoch"]: s["version"]
        for s in sink.snapshots()
        if s["operation"] == "merge"
    }


def test_rollback_restores_state_preserves_history(spark, tmp_path):
    log, pdf, sink = _table(spark, tmp_path)
    head = sink.manifest().version
    v1 = _merge_versions(sink)[1]
    out = sink.rollback(v1)
    assert out["restored_version"] == v1
    assert out["new_version"] == head + 1
    assert out["last_committed_epoch"] == 1
    # the restored head reads as the epoch-1 state
    got = sink.load().select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(pdf[pdf["epoch"] <= 1]))
    # history preserved: the rolled-past head is still readable, and the
    # restore commit is labeled
    snaps = {s["version"]: s for s in sink.snapshots()}
    assert snaps[head]["readable"]
    assert snaps[head + 1]["operation"] == "rollback"
    assert snaps[head + 1]["metrics"]["rollback_of"] == v1
    pre = sink.load(version=head).select(*PAYLOAD).toPandas()
    assert_state_equal(pre, oracle_reduce(pdf))


def test_replay_after_rollback_reconverges(spark, tmp_path):
    """Resume picks up at the restored epoch + 1 and re-applies the tail —
    the final state matches the full-changelog oracle again."""
    log, pdf, sink = _table(spark, tmp_path)
    sink.rollback(_merge_versions(sink)[1])
    assert sink.last_committed_epoch() == 1
    sink2 = replay_dataframe(spark, log, str(tmp_path / "t"))
    assert sink2.last_committed_epoch() == int(pdf["epoch"].max())
    got = sink2.load().select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(pdf))


def test_rollback_guards_and_gc_safety(spark, tmp_path):
    log, pdf, sink = _table(spark, tmp_path)
    head = sink.manifest().version
    with pytest.raises(ValueError, match="already at version"):
        sink.rollback(head)
    v1 = _merge_versions(sink)[1]
    sink.rollback(v1)
    # GC after the restore must keep the restored head's (old) data alive:
    # its bucket entries reference the epoch-1 data dirs
    sink.expire_snapshots(keep_last=1)
    got = sink.load().select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(pdf[pdf["epoch"] <= 1]))
    # a schema-only-retained version (data GC'd) is not restorable
    schema_only = [s["version"] for s in sink.snapshots() if not s["readable"]]
    if schema_only:
        with pytest.raises(ValueError, match="schema-only"):
            sink.rollback(schema_only[0])


def test_change_feed_across_rollback_guard(spark, tmp_path):
    """A feed window spanning a rollback carries reverted rows with OLDER
    ordinals, which lose a replica's strict merge guard — the feed must
    refuse (re-bootstrap contract), and the re-bootstrap must converge."""
    from jurisprudencia_privada_etl_spark.operators.change_feed import (
        change_feed,
        snapshot_as_changelog,
    )

    log, pdf, sink = _table(spark, tmp_path)
    v_before = sink.manifest().version
    # a replica bootstrapped at the pre-rollback head
    replica = replay_dataframe(
        spark, snapshot_as_changelog(sink, epoch=0), str(tmp_path / "replica")
    )
    assert_state_equal(
        replica.load().select(*PAYLOAD).toPandas(), oracle_reduce(pdf)
    )
    sink.rollback(_merge_versions(sink)[1])
    with pytest.raises(ValueError, match="rollback snapshot"):
        change_feed(sink, v_before)
    # audit consumption is explicit opt-in, and the feed itself is the
    # correct state diff (the hazard is only the guarded replica apply)
    assert change_feed(sink, v_before, on_rollback="allow").count() > 0
    # the documented recovery: re-bootstrap the replica from the new head
    replica2 = replay_dataframe(
        spark, snapshot_as_changelog(sink, epoch=0), str(tmp_path / "replica2")
    )
    assert_state_equal(
        replica2.load().select(*PAYLOAD).toPandas(),
        oracle_reduce(pdf[pdf["epoch"] <= 1]),
    )

"""Write-audit-publish staging (Iceberg's WAP pattern on the engine's
manifest line): stage a merge invisibly, audit the candidate state, then
atomically publish or abort."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.lww import lww_dedup_agg
from jurisprudencia_privada_etl_spark.plans import manifest as mf
from jurisprudencia_privada_etl_spark.plans.replay import (
    AuditRejectedError,
    ReplayConfig,
    replay_dataframe,
)
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

PAYLOAD = ["repo", "path", "ordinal", "content"]


def _state(sink, **kw) -> pd.DataFrame:
    return (
        sink.load(**kw).select(*PAYLOAD).toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )


def _log(spark, seed=61, n=1500, epochs=3):
    return synthetic_changelog(
        spark, n, seed=seed, n_epochs=epochs, n_repos=6, paths_per_repo=40,
        pct_update=0.4, pct_delete=0.15,
    )


def _winners(log, epoch):
    batch = log.where(F.col("epoch") == epoch)
    w = lww_dedup_agg(batch)
    return w.withColumn("content_sha", F.sha2(F.col("content").cast("string"), 256))


def test_staged_merge_is_invisible_until_published(spark, tmp_path):
    log = _log(spark)
    sink = replay_dataframe(spark, log.where(F.col("epoch") <= 1), str(tmp_path / "t"))
    before = _state(sink)
    v_before = sink.manifest().version

    r = sink.merge(_winners(log, 2), epoch=2, stage=True)
    assert r["staged"] is True
    # committed line unmoved; staged candidate readable for audits
    assert sink.manifest().version == v_before
    assert sink.last_committed_epoch() == 1
    pd.testing.assert_frame_equal(_state(sink), before)
    staged_rows = sink.load_staged().count()
    assert staged_rows != len(before) or not _state(sink).equals(before)

    pub = sink.publish_staged()
    assert pub["epoch"] == 2 and pub["published_version"] == v_before + 1
    assert sink.last_committed_epoch() == 2

    # published state == the state a direct (ungated) merge produces
    direct = replay_dataframe(spark, log, str(tmp_path / "direct"))
    pd.testing.assert_frame_equal(_state(sink), _state(direct))


def test_abort_staged_removes_data_and_allows_rerun(spark, tmp_path):
    log = _log(spark, seed=67)
    sink = replay_dataframe(spark, log.where(F.col("epoch") <= 1), str(tmp_path / "t"))
    before = _state(sink)
    r = sink.merge(_winners(log, 2), epoch=2, stage=True)
    import glob as _glob

    pat = os.path.join(sink.table_path, "data", f"v{r['staged_version']:08d}*")
    data_dirs = [p for p in _glob.glob(pat) if os.path.isdir(p)]
    assert data_dirs

    out = sink.abort_staged()
    assert out["aborted"] is True
    assert sink.staged() is None
    assert not any(
        os.path.isdir(p) for p in data_dirs
    ), "aborted staged data files must be deleted"
    pd.testing.assert_frame_equal(_state(sink), before)

    # the epoch can re-run normally afterwards (nothing was committed)
    sink.merge(_winners(log, 2), epoch=2)
    assert sink.last_committed_epoch() == 2


def test_promote_staged_rejects_stale_parent(spark, tmp_path):
    """Optimistic concurrency: if the table advances past the staged
    snapshot's parent, promotion must refuse — the staged merge was
    computed against a state that no longer exists."""
    log = _log(spark, seed=71)
    sink = replay_dataframe(spark, log.where(F.col("epoch") <= 1), str(tmp_path / "t"))
    sink.merge(_winners(log, 2), epoch=2, stage=True)
    # a competing committer lands the same epoch directly
    sink.merge(_winners(log, 2), epoch=2)
    with pytest.raises(mf.StaleStagedError):
        sink.publish_staged()
    assert sink.abort_staged()["aborted"] is True


def test_replay_audit_gate_publishes_or_stops(spark, tmp_path):
    """ReplayConfig(audit_gate=...): an accepting gate converges identically
    to an ungated replay; a rejecting gate aborts the staged epoch, stops
    the replay, and leaves the committed line exactly where it was."""
    log = _log(spark, seed=73)
    calls = []

    def accept(sink, metrics):
        calls.append(metrics["epoch"])
        return True

    gated = replay_dataframe(
        spark, log, str(tmp_path / "gated"), ReplayConfig(audit_gate=accept)
    )
    plain = replay_dataframe(spark, log, str(tmp_path / "plain"))
    assert calls == [0, 1, 2]
    pd.testing.assert_frame_equal(_state(gated), _state(plain))

    def reject_epoch_1(sink, metrics):
        return metrics["epoch"] < 1

    with pytest.raises(AuditRejectedError):
        replay_dataframe(
            spark, log, str(tmp_path / "stopped"), ReplayConfig(audit_gate=reject_epoch_1)
        )
    from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink

    stopped = HadoopParquetSink(spark, str(tmp_path / "stopped"))
    assert stopped.last_committed_epoch() == 0, "rejected epoch must not commit"
    assert stopped.staged() is None, "rejected stage must be aborted"


def test_wap_works_in_merge_on_read_mode(spark, tmp_path):
    log = _log(spark, seed=79)
    cfg = ReplayConfig(write_mode="mor")
    sink = replay_dataframe(spark, log.where(F.col("epoch") <= 1), str(tmp_path / "t"), cfg)
    v0 = sink.manifest().version
    r = sink.merge(_winners(log, 2), epoch=2, stage=True)
    assert r["staged"] and sink.manifest().version == v0
    sink.publish_staged()
    direct = replay_dataframe(spark, log, str(tmp_path / "direct"), cfg)
    pd.testing.assert_frame_equal(_state(sink), _state(direct))

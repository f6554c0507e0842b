"""Key-stats sidecar (sources/changelog.write_key_stats): the file-level
manifest-stats pattern (Iceberg manifests / Delta file stats) applied to
the stored changelog, so per-epoch planning (touched buckets + lineage)
is a driver-side metadata read, not an O(events) scan.

Contract under test: the sidecar path returns EXACTLY the touched-bucket
set the scan path computes, lineage totals agree, a replay resolved via
the sidecar converges bit-for-bit with one resolved via scans, and every
staleness hazard (append, foreign changelog, non-dividing n_buckets,
validation mode) falls back to the scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.sources.changelog import (
    STAT_BUCKETS,
    read_epoch,
    read_epoch_stats,
    write_changelog,
)
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import assert_state_equal, oracle_reduce


@pytest.fixture(scope="module")
def clog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sidecar") / "changelog")
    write_changelog(
        synthetic_changelog(
            spark, 4000, seed=7, n_epochs=3, n_repos=12, paths_per_repo=50,
            pct_update=0.4, pct_delete=0.1, num_partitions=4,
        ),
        path,
    )
    return path


def test_sidecar_written_and_hidden(spark, clog):
    assert os.path.isdir(os.path.join(clog, "_key_stats", "buckets"))
    assert os.path.isdir(os.path.join(clog, "_key_stats", "files"))
    # underscore dir is invisible to changelog scans (parquet hidden-file rule)
    assert "stat_bucket" not in spark.read.parquet(clog).columns


@pytest.mark.parametrize("n_buckets", [16, 64, 128])
def test_sidecar_matches_scan(spark, clog, n_buckets):
    """Folded touched-set == scan's touched-set for every dividing layout;
    lineage event/byte TOTALS agree (split granularity differs: sidecar is
    per-file, scan is per-scan-partition — both are valid lineage units)."""
    sink = HadoopParquetSink(spark, "/nonexistent", n_buckets=n_buckets)
    for epoch in range(3):
        fast = read_epoch_stats(clog, epoch, n_buckets)
        assert fast is not None
        touched, lineage = fast
        s_touched, s_lineage = sink.key_stats(
            read_epoch(spark, clog, epoch), n_buckets=n_buckets
        )
        assert touched == s_touched
        assert sum(r["events"] for r in lineage) == sum(r["events"] for r in s_lineage)
        assert sum(r["bytes"] for r in lineage) == sum(r["bytes"] for r in s_lineage)


def test_sidecar_fallbacks(spark, clog, tmp_path):
    # n_buckets that does not divide STAT_BUCKETS -> None
    assert STAT_BUCKETS % 48 != 0
    assert read_epoch_stats(clog, 0, 48) is None
    # epoch with no entry -> None
    assert read_epoch_stats(clog, 99, 64) is None
    # foreign changelog without a sidecar -> None
    plain = str(tmp_path / "plain")
    synthetic_changelog(spark, 500, n_epochs=1, num_partitions=2).write.mode(
        "overwrite"
    ).partitionBy("epoch").parquet(plain)
    assert read_epoch_stats(plain, 0, 64) is None


def test_append_invalidates_sidecar(spark, clog, tmp_path):
    path = str(tmp_path / "appended")
    base = synthetic_changelog(spark, 1000, seed=3, n_epochs=2, num_partitions=2)
    write_changelog(base, path)
    assert read_epoch_stats(path, 0, 64) is not None
    extra = synthetic_changelog(spark, 500, seed=4, n_epochs=2, num_partitions=2)
    write_changelog(extra, path, mode="append")
    # stale stats would undercount the appended rows -> sidecar must be gone
    assert read_epoch_stats(path, 0, 64) is None


def test_replay_via_sidecar_matches_scan_replay(spark, clog, tmp_path):
    """End-to-end: same final state, same per-epoch run counters, whether
    stats come from the sidecar or the scan (sidecar removed)."""
    import shutil

    cfg = ReplayConfig(n_buckets=64)
    fast = replay(spark, clog, str(tmp_path / "fast"), cfg)
    noside = str(tmp_path / "clog_noside")
    shutil.copytree(clog, noside)
    shutil.rmtree(os.path.join(noside, "_key_stats"))
    slow = replay(spark, noside, str(tmp_path / "slow"), cfg)

    pdf = spark.read.parquet(clog).toPandas()
    expected = oracle_reduce(pdf)
    fast_state = (
        fast.load().select("repo", "path", "commit", "lang", "content",
                           "ordinal", "content_sha").toPandas()
    )
    assert_state_equal(fast_state, expected)
    slow_state = (
        slow.load().select("repo", "path", "commit", "lang", "content",
                           "ordinal", "content_sha").toPandas()
    )
    assert_state_equal(slow_state, expected)

    from jurisprudencia_privada_etl_spark.plans import manifest as mf

    for v in (1, 2, 3):
        a, b = mf.load(str(tmp_path / "fast"), v), mf.load(str(tmp_path / "slow"), v)
        for k in ("created", "updated", "deleted", "kept"):
            assert a.metrics[k] == b.metrics[k], (v, k)
        assert sum(p["events"] for p in a.metrics["partitions"]) == sum(
            p["events"] for p in b.metrics["partitions"]
        )


def test_validating_replay_ignores_sidecar_lineage(spark, tmp_path):
    """validate=True must not consume sidecar stats (they count rows the
    dead-letter filter drops).  Inject an invalid row and check lineage
    excludes it."""
    log = synthetic_changelog(spark, 600, seed=9, n_epochs=1, num_partitions=2)
    bad = log.limit(1).withColumn("repo", F.lit(None).cast("string"))
    path = str(tmp_path / "clog")
    write_changelog(log.unionByName(bad), path)
    cfg = ReplayConfig(n_buckets=64, validate=True)
    sink = replay(spark, path, str(tmp_path / "t"), cfg)
    m = sink.manifest()
    assert sum(p["events"] for p in m.metrics["partitions"]) == 600
    assert m.metrics.get("dead_letter_rows") == 1


def test_key_stats_by_epoch_matches_per_epoch_scan(spark, clog):
    """The one-pass grouped stats (replay_dataframe's planning scan) must
    agree with the per-epoch key_stats form: identical touched-bucket sets
    and identical lineage event/byte totals per epoch (split granularity is
    the lineage unit, pinned by totals as elsewhere in this file)."""
    sink = HadoopParquetSink(spark, "/nonexistent", n_buckets=32)
    frame = spark.read.parquet(clog)
    grouped = sink.key_stats_by_epoch(frame, n_buckets=32)
    epochs = sorted(r["epoch"] for r in frame.select("epoch").distinct().collect())
    assert sorted(grouped) == epochs
    for epoch in epochs:
        touched, lineage = sink.key_stats(
            frame.where(F.col("epoch") == epoch), n_buckets=32
        )
        g_touched, g_lineage = grouped[epoch]
        assert g_touched == touched
        assert sum(r["events"] for r in g_lineage) == sum(r["events"] for r in lineage)
        assert sum(r["bytes"] for r in g_lineage) == sum(r["bytes"] for r in lineage)

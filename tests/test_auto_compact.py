"""Auto-compaction policy (ReplayConfig.auto_compact_files_per_bucket):
Delta-style auto OPTIMIZE on the replay loop.  The payoff case is
merge-on-read, whose per-bucket delta stacks otherwise grow one file set
per epoch; the policy folds a stack only when its file count exceeds the
bar, so MoR keeps its low write amplification between folds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import assert_state_equal


def _clog(spark, n=3000, epochs=6):
    return synthetic_changelog(spark, n, n_epochs=epochs, num_partitions=4)


def test_mor_replay_auto_compacts_deep_delta_stacks(spark, tmp_path):
    clog = _clog(spark).cache()
    clog.count()
    auto = replay_dataframe(
        spark, clog, str(tmp_path / "auto"),
        ReplayConfig(write_mode="mor", n_buckets=8, auto_compact_files_per_bucket=3),
    )
    # every bucket's base+delta file count stays at or under the bar plus
    # the epochs that arrived after the last fold
    import os

    m = auto.manifest()
    for entry in m.buckets.values():
        dirs = [entry["path"], *(d["path"] for d in entry.get("deltas") or [])]
        n_files = sum(
            1
            for rel in dirs
            for f in os.listdir(os.path.join(auto.table_path, rel))
            if f.endswith(".parquet")
        )
        assert n_files <= 3, f"bucket exceeded the auto-compact bar: {n_files}"
    # at least one compaction snapshot actually ran
    ops = [s["operation"] for s in auto.snapshots()]
    assert "compact" in ops
    # state parity vs an un-policed CoW replay of the same changelog
    plain = replay_dataframe(
        spark, clog, str(tmp_path / "plain"), ReplayConfig(n_buckets=8)
    )
    assert_state_equal(auto.load().toPandas(), plain.load().toPandas())
    clog.unpersist()


def test_auto_compact_is_noop_for_cow_under_bar(spark, tmp_path):
    """CoW rewrites touched buckets wholesale, so under the bar the policy
    must add zero snapshots (the check is a driver-side listing)."""
    clog = _clog(spark, n=2000, epochs=3).cache()
    clog.count()
    auto = replay_dataframe(
        spark, clog, str(tmp_path / "t"),
        ReplayConfig(n_buckets=8, auto_compact_files_per_bucket=4),
    )
    ops = [s["operation"] for s in auto.snapshots()]
    assert "compact" not in ops
    last = clog.agg(F.max("epoch")).first()[0]
    assert auto.manifest().last_committed_epoch == last
    clog.unpersist()


def test_resume_after_kill_with_auto_compact(spark, tmp_path):
    """Compaction snapshots interleave with epoch commits; the epoch stamp
    is untouched by them, so a killed-and-rerun replay resumes correctly."""
    clog = _clog(spark, n=2000, epochs=4).cache()
    clog.count()
    path = str(tmp_path / "t")
    cfg = ReplayConfig(write_mode="mor", n_buckets=8, auto_compact_files_per_bucket=2)
    # run epochs 0-1, then "crash"
    replay_dataframe(spark, clog.where(F.col("epoch") < 2), path, cfg)
    sink = replay_dataframe(spark, clog, path, cfg)  # resume: applies the rest
    assert sink.manifest().last_committed_epoch == clog.agg(F.max("epoch")).first()[0]
    plain = replay_dataframe(spark, clog, str(tmp_path / "plain"), ReplayConfig(n_buckets=8))
    assert_state_equal(sink.load().toPandas(), plain.load().toPandas())
    clog.unpersist()

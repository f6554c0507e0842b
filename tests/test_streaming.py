"""Streaming replay (foreachBatch + AvailableNow) converges to the same
state as the batch oracle, and re-runs are no-ops."""

from __future__ import annotations

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.sources.changelog import write_changelog
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog
from jurisprudencia_privada_etl_spark.streaming.stream_replay import stream_metrics, stream_replay

from tests.conftest import assert_state_equal, oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]


def test_stream_replay_matches_oracle(spark, tmp_path):
    log = synthetic_changelog(spark, 1500, seed=41, n_epochs=3, n_repos=6,
                              paths_per_repo=50, pct_update=0.4, pct_delete=0.15)
    pdf = log.toPandas()
    clog = str(tmp_path / "clog")
    write_changelog(log, clog)

    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    # several micro-batches: limit files per trigger
    stream_replay(spark, clog, table, ckpt, ReplayConfig(), max_files_per_trigger=4)

    sink = HadoopParquetSink(spark, table)
    got = sink.load().select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(pdf))

    metrics = stream_metrics(spark, table)
    assert len(metrics) >= 2  # really ran as multiple micro-batches
    assert sum(m["created"] for m in metrics if "created" in m) > 0

    # restart over the same checkpoint: nothing new to process, state unchanged
    stream_replay(spark, clog, table, ckpt, ReplayConfig())
    again = HadoopParquetSink(spark, table).load().select(*PAYLOAD).toPandas()
    assert_state_equal(again, oracle_reduce(pdf))

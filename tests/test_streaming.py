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


def test_streaming_debezium_tail_replays(spark, tmp_path):
    """A streaming tail of Debezium envelope JSON (text files standing in
    for a Kafka topic) drives the SAME micro-batch merge path via the
    stream_replay source seam: parse_debezium is a pure column transform,
    so it composes with readStream unchanged and the converged state
    matches the independent reducer."""
    import json as _json

    from jurisprudencia_privada_etl_spark.sources.debezium import parse_debezium

    log = synthetic_changelog(spark, 600, seed=53, n_epochs=2, n_repos=5,
                              paths_per_repo=40, pct_update=0.4, pct_delete=0.15)
    pdf = log.toPandas()
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    lines = [
        _json.dumps(
            {
                "payload": {
                    "before": None if r.op != "D" else {
                        "repo": r.repo, "path": r.path, "commit": r.commit,
                        "lang": r.lang, "content": r.content,
                    },
                    "after": None if r.op == "D" else {
                        "repo": r.repo, "path": r.path, "commit": r.commit,
                        "lang": r.lang, "content": r.content,
                    },
                    "source": {"ts_ms": None, "lsn": int(r.ordinal),
                               "db": "app", "table": "repos"},
                    "op": {"I": "c", "U": "u", "D": "d"}[r.op],
                    "ts_ms": None,
                }
            }
        )
        for r in pdf.itertuples()
    ]
    # two files → at least two micro-batches with maxFilesPerTrigger=1
    half = len(lines) // 2
    (feed_dir / "a.jsonl").write_text("\n".join(lines[:half]) + "\n")
    (feed_dir / "b.jsonl").write_text("\n".join(lines[half:]) + "\n")

    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .text(str(feed_dir))
    )
    table = str(tmp_path / "t")
    stream_replay(
        spark, "", table, str(tmp_path / "ckpt"),
        ReplayConfig(), source_df=parse_debezium(raw, events_per_epoch=10_000),
    )
    got = HadoopParquetSink(spark, table).load().select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(pdf))
    assert len(stream_metrics(spark, table)) >= 2


def test_stream_replay_keeps_materialized_views_current(spark, tmp_path):
    """views=[...]: each committed micro-batch refreshes the attached
    materialized views from its own change feed — after the stream drains,
    every view equals a full recompute of the final state, and a checkpoint
    restart leaves them untouched (both stamps no-op)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from jurisprudencia_privada_etl_spark.operators.mview import (
        MaterializedView,
        aggregate_view,
        public_columns,
    )
    from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN

    log = synthetic_changelog(spark, 1500, seed=59, n_epochs=3, n_repos=6,
                              paths_per_repo=50, pct_update=0.4, pct_delete=0.15)
    table = str(tmp_path / "t")
    clog = str(tmp_path / "clog")
    ckpt = str(tmp_path / "ckpt")
    # bootstrap: epoch 0 streams in first, then the view snapshots that state
    write_changelog(log.where(F.col("epoch") == 0), clog)
    stream_replay(spark, clog, table, ckpt, ReplayConfig())
    sink = HadoopParquetSink(spark, table)
    specs = [("n_rows", "count", None), ("sum_ordinal", "sum", "ordinal")]
    mv = MaterializedView(spark, sink, str(tmp_path / "mv"))
    mv.create(["lang"], specs)

    # the tail keeps flowing; every committed micro-batch refreshes the view
    write_changelog(log.where(F.col("epoch") >= 1), clog, mode="append")
    stream_replay(spark, clog, table, ckpt, ReplayConfig(),
                  max_files_per_trigger=4, views=[mv])

    def cmp():
        want = aggregate_view(sink.load().drop(BUCKET_COLUMN), ["lang"], specs).select(
            *public_columns(["lang"], specs)
        ).toPandas().sort_values("lang").reset_index(drop=True)
        got = mv.df().toPandas().sort_values("lang").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    cmp()
    v_synced = mv.synced_version
    # restart over the same checkpoint: no new batches, view untouched
    stream_replay(spark, clog, table, ckpt, ReplayConfig(), views=[mv])
    assert mv.synced_version == v_synced
    cmp()


def test_stream_replay_validation_dead_letters(spark, tmp_path):
    """The streaming path applies the same F10 validation gate as batch:
    invalid / CHECK-violating rows dead-letter under the micro-batch id and
    never reach the table; lineage counts only applied rows."""
    from pyspark.sql import functions as F

    from jurisprudencia_privada_etl_spark.operators.dead_letter import read_dead_letters

    log = synthetic_changelog(spark, 800, seed=57, n_epochs=2, n_repos=5,
                              paths_per_repo=30, pct_update=0.3, pct_delete=0.1)
    clog = str(tmp_path / "clog")
    write_changelog(log, clog)

    table = str(tmp_path / "t")
    cfg = ReplayConfig(
        validate=True,
        check_constraints={"lang_known": "lang IN ('py', 'ts', 'go', 'rs', 'java', 'md')"},
    )
    stream_replay(spark, clog, table, str(tmp_path / "ckpt"), cfg)

    sink = HadoopParquetSink(spark, table)
    live = sink.load().toPandas()
    ok = {"py", "ts", "go", "rs", "java", "md"}
    assert set(live["lang"].dropna()).issubset(ok)

    dead = read_dead_letters(spark, table).toPandas()
    assert len(dead) > 0
    assert (dead["error"] == "check constraint violated: lang_known").all()
    assert not set(dead["lang"]).issubset(ok)

    # the per-batch manifests carry the dead-letter counts
    n_dead_metric = sum(
        m.get("dead_letter_rows", 0) for m in stream_metrics(spark, table)
    )
    assert n_dead_metric == len(dead)

    # batch replay with the identical config converges to the same state
    from jurisprudencia_privada_etl_spark.plans.replay import replay_dataframe

    bsink = replay_dataframe(spark, log, str(tmp_path / "b"), cfg)
    bl = bsink.load().select(*PAYLOAD).toPandas()
    sl = live[PAYLOAD]
    assert_state_equal(sl, bl)


def test_stream_replay_rate_source_live_unbounded(spark, tmp_path):
    """VERDICT r04 item 6 — streaming over a genuinely UNBOUNDED non-file
    source: a rate stream mapped (pure JVM exprs) into Debezium envelopes
    drives continuous micro-batches through the same merge path, with the
    validation gate live (every 17th event ships a null path and must
    dead-letter).  The query is stopped mid-flight; because rate delivers
    the contiguous prefix 0..M and every committed batch's lineage counts
    its events, M is recoverable from the sink's own manifests — the
    converged state must equal the batch oracle over that exact prefix."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from jurisprudencia_privada_etl_spark.sources.debezium import parse_debezium

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 2000)
        .load()
    )
    v = F.col("value")
    op_c = (
        F.when(v % 10 < 6, F.lit("c")).when(v % 10 < 9, F.lit("u")).otherwise(F.lit("d"))
    )
    path_c = F.when(v % 17 == 3, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("p"), (v % 23).cast("string"))
    )
    img = F.struct(
        F.concat(F.lit("r"), (v % 5).cast("string")).alias("repo"),
        path_c.alias("path"),
        F.concat(F.lit("h"), v.cast("string")).alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("c"), v.cast("string")).alias("content"),
    )
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.when(op_c == "d", img).alias("before"),
                F.when(op_c != "d", img).alias("after"),
                F.struct(
                    F.lit(None).cast("long").alias("ts_ms"),
                    v.alias("lsn"),
                    F.lit("app").alias("db"),
                    F.lit("repos").alias("table"),
                ).alias("source"),
                op_c.alias("op"),
                F.lit(None).cast("long").alias("ts_ms"),
            ).alias("payload")
        )
    ).alias("value")
    src = parse_debezium(rate.select(envelope), events_per_epoch=10**9)

    table = str(tmp_path / "t")
    q = stream_replay(
        spark, "", table, str(tmp_path / "ckpt"),
        ReplayConfig(validate=True), source_df=src, available_now=False,
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline and len(stream_metrics(spark, table)) < 3:
            _time.sleep(1)
        assert len(stream_metrics(spark, table)) >= 3, "no continuous micro-batches"
    finally:
        q.stop()
        q.awaitTermination()

    metrics = stream_metrics(spark, table)
    applied = sum(
        p["events"] for m in metrics for p in (m.get("partitions") or [])
    )
    dead_total = sum(int(m.get("dead_letter_rows") or 0) for m in metrics)
    total = applied + dead_total
    assert total > 0
    m_max = total - 1  # contiguous prefix 0..M

    # batch oracle over the same deterministic mapping of 0..M
    vals = pd.DataFrame({"v": range(total)})
    vals["repo"] = "r" + (vals.v % 5).astype(str)
    vals["path"] = "p" + (vals.v % 23).astype(str)
    vals["commit"] = "h" + vals.v.astype(str)
    vals["lang"] = "py"
    vals["content"] = "c" + vals.v.astype(str)
    vals["ordinal"] = vals.v
    d = vals.v % 10
    vals["op"] = "I"
    vals.loc[(d >= 6) & (d < 9), "op"] = "U"
    vals.loc[d >= 9, "op"] = "D"
    invalid = (vals.v % 17) == 3
    assert dead_total == int(invalid.sum()), "validation gate missed null-path rows"
    got = HadoopParquetSink(spark, table).load().select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(vals[~invalid].drop(columns=["v"])))
    assert m_max >= 0

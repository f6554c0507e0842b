"""Streaming sessionization (streaming/sessions.py) converges to the batch
sessionizer on the same data — both the declarative session_window path and
the applyInPandasWithState custom-stateful path.

Mechanics: chronological parquet files fed one-per-trigger (AvailableNow)
so the watermark advances across micro-batches; far-future sentinel events
push the watermark past every real session's close so Append mode emits
them all.  Sessions owned by sentinels are excluded from the comparison
(they may stay open at end-of-stream)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.temporal import sessionize
from jurisprudencia_privada_etl_spark.streaming.sessions import (
    streaming_session_agg,
    streaming_sessionize_with_state,
)

GAP_S = 60
T0 = dt.datetime(2024, 1, 1, 10, 0, 0)
SENTINEL_T = T0 + dt.timedelta(hours=6)


def _mk(sec_offset: int, user: str, eid: int):
    return (user, T0 + dt.timedelta(seconds=sec_offset), eid)


def _write_waves(spark, tmp_path):
    """Three real waves + two sentinel waves, chronological files."""
    waves = [
        # wave 1: u1 session A (two events), u2 session A start
        [_mk(0, "u1", 1), _mk(30, "u1", 2), _mk(10, "u2", 100)],
        # wave 2: u2 session A extends (40s gap < 60), u1 session B (200s later)
        [_mk(50, "u2", 101), _mk(230, "u1", 3)],
        # wave 3: u1 session B extends; u2 session B (big gap)
        [_mk(260, "u1", 4), _mk(400, "u2", 102)],
        # sentinels: far future so every real session closes
        [(u, SENTINEL_T, 9000 + i) for i, u in enumerate(["u1", "u2"])],
        [(u, SENTINEL_T + dt.timedelta(hours=1), 9100 + i) for i, u in enumerate(["u1", "u2"])],
    ]
    src = tmp_path / "events"
    src.mkdir()
    schema = "user string, ts timestamp, event_id long"
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, schema).coalesce(1).write.parquet(str(src / f"w{i}"))
    all_rows = [r for w in waves for r in w]
    return str(src), spark.createDataFrame(all_rows, schema)


def _expected_sessions(batch_df):
    """Batch-sessionize and roll up, dropping sentinel-era sessions."""
    sess = sessionize(batch_df, key="user", ts="ts", gap_seconds=GAP_S)
    agg = (
        sess.groupBy("user", "session_seq")
        .agg(
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
            F.count("*").alias("n_events"),
            F.min_by("event_id", "ts").alias("first_event_id"),
            F.max_by("event_id", "ts").alias("last_event_id"),
        )
        .where(F.col("sess_start") < F.lit(SENTINEL_T))
    )
    return {
        (r["user"], r["sess_start"], r["sess_end"]): (
            r["n_events"], r["first_event_id"], r["last_event_id"]
        )
        for r in agg.collect()
    }


def _run_stream(spark, src, out_df_fn, name):
    stream = (
        spark.readStream.schema("user string, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        out_df_fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}").toPandas()


def test_streaming_session_agg_matches_batch(spark, tmp_path):
    src, batch_df = _write_waves(spark, tmp_path)
    got = _run_stream(
        spark,
        src,
        lambda s: streaming_session_agg(s, key="user", ts="ts",
                                        gap_seconds=GAP_S, watermark="5 seconds"),
        "sess_agg_out",
    )
    exp = _expected_sessions(batch_df)
    real = got[got["sess_start"] < pd.Timestamp(SENTINEL_T)]
    # session_window's end = last event ts + gap (built-in convention)
    got_keys = {
        (r.user, r.sess_start.to_pydatetime(),
         r.sess_end.to_pydatetime() - dt.timedelta(seconds=GAP_S)): int(r.n_events)
        for r in real.itertuples()
    }
    assert got_keys == {k: v[0] for k, v in exp.items()}


def test_streaming_sessionize_with_state_matches_batch(spark, tmp_path):
    src, batch_df = _write_waves(spark, tmp_path)
    got = _run_stream(
        spark,
        src,
        lambda s: streaming_sessionize_with_state(
            s, key="user", ts="ts", event_id="event_id",
            gap_seconds=GAP_S, watermark="5 seconds",
        ),
        "sess_state_out",
    )
    exp = _expected_sessions(batch_df)
    real = got[got["sess_start"] < pd.Timestamp(SENTINEL_T)]
    got_map = {
        (r.key, r.sess_start.to_pydatetime(), r.sess_end.to_pydatetime()): (
            int(r.n_events), int(r.first_event_id), int(r.last_event_id)
        )
        for r in real.itertuples()
    }
    assert got_map == exp
    # state-store contract: every emitted session is closed exactly once
    assert len(real) == len(exp)

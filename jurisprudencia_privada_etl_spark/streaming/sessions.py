"""Streaming sessionization — the watermark/stateful half of the temporal
family (batch twin: operators/temporal.sessionize).

Two implementations with different contracts:

* :func:`streaming_session_agg` — the declarative path: ``withWatermark``
  + the built-in ``session_window`` gap window.  Catalyst owns the state
  store, merges overlapping windows, and evicts state once the watermark
  passes a session's end + gap.  Late events inside the watermark
  re-open/extend their session; later ones are dropped (counted by the
  state-store metrics).  Output rows appear in Append mode when their
  session CLOSES — one row per (key, session), aggregate columns only.

* :func:`streaming_sessionize_with_state` — the custom-stateful path via
  ``applyInPandasWithState`` (transformWithState's Arrow-batched
  predecessor, stable in PySpark 4.x).  Keeps ONE open session per key in
  the state store (constant state per key — this is what makes it safe at
  100 TB: state size is O(keys), never O(events)), extends it with each
  Arrow batch, emits a session row the moment the event-time timeout
  (session end + gap) fires.  Use this one when the consumer needs the
  session row to carry custom payloads the built-in aggregate API cannot
  express (first/last event ids here; in general anything computable from
  a pandas batch).

Both read any streaming DataFrame (file tail, Kafka, rate source) with a
timestamp column; both require a watermark for state eviction.  At scale
the shuffle key is the session key — same skew remedies as the batch
window (salt a hot key's time range upstream).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_session_agg", "streaming_sessionize_with_state", "SESSION_OUT_SCHEMA"]


def streaming_session_agg(
    stream: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Declarative streaming sessions: one appended row per closed session
    with start/end/count.  Pure built-ins — ``session_window`` plans a
    streaming session aggregation with watermark-driven eviction."""
    gap = f"{int(gap_seconds)} seconds"
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_events",
        )
    )


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("first_event_id", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("first_id", LongType()),
        StructField("last_id", LongType()),
    ]
)


def streaming_sessionize_with_state(
    stream: DataFrame,
    key: str,
    ts: str,
    event_id: str,
    gap_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful sessions via ``applyInPandasWithState``: per key,
    one open session lives in the state store; a session row is emitted
    when the event-time timeout (last event + gap, clamped past the
    current watermark) fires.  Emits first/last event ids — per-session
    payload the aggregate API can't produce.

    Batches arrive Arrow-vectorized; all per-batch math is pandas column
    ops (no python row loop).  Events older than the open session's end
    minus the gap have, by watermark contract, already been dropped
    upstream; stragglers inside the watermark extend the session.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = int(gap_seconds) * 1000

    def fn(
        k: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, end_ms, n, first_id, last_id = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k[0]],
                    "sess_start": [pd.Timestamp(start_ms, unit="ms")],
                    "sess_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "first_event_id": [first_id],
                    "last_event_id": [last_id],
                }
            )
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        batch = pd.concat(frames).sort_values(ts)
        # normalize to ns before the int view — Arrow may hand us
        # datetime64[us] (pandas 2) or [ns] depending on the path
        t_ms = (
            batch[ts].to_numpy().astype("datetime64[ns]").astype("int64") // 1_000_000
        )
        ids = batch[event_id].to_numpy()

        if state.exists:
            start_ms, end_ms, n, first_id, last_id = state.get
        else:
            start_ms = end_ms = None  # type: ignore[assignment]
            n = 0
            first_id = last_id = None  # type: ignore[assignment]

        out: dict[str, list] = {c.name: [] for c in SESSION_OUT_SCHEMA.fields}
        # split the sorted batch at gap boundaries (vectorized); each chunk
        # either extends the open session or closes it and starts anew
        import numpy as np

        breaks = np.flatnonzero(np.diff(t_ms) > gap_ms) + 1
        for chunk_idx, chunk in enumerate(np.split(np.arange(len(t_ms)), breaks)):
            c_start, c_end = int(t_ms[chunk[0]]), int(t_ms[chunk[-1]])
            c_n = len(chunk)
            c_first, c_last = int(ids[chunk[0]]), int(ids[chunk[-1]])
            if n and c_start - end_ms <= gap_ms:
                # in-watermark stragglers may even precede the open
                # session's start — widen both edges
                if c_start < start_ms:
                    start_ms, first_id = c_start, c_first
                end_ms = max(end_ms, c_end)
                n += c_n
                if c_end >= end_ms:
                    last_id = c_last
            else:
                if n:  # close the previous session inline
                    out["key"].append(k[0])
                    out["sess_start"].append(pd.Timestamp(start_ms, unit="ms"))
                    out["sess_end"].append(pd.Timestamp(end_ms, unit="ms"))
                    out["n_events"].append(n)
                    out["first_event_id"].append(first_id)
                    out["last_event_id"].append(last_id)
                start_ms, end_ms, n = c_start, c_end, c_n
                first_id, last_id = c_first, c_last

        state.update((start_ms, end_ms, n, first_id, last_id))
        # fire once the watermark passes session end + gap; never set a
        # timeout at or before the current watermark (Spark rejects it)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(end_ms + gap_ms, wm + 1))
        if out["key"]:
            yield pd.DataFrame(out)

    return (
        stream.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

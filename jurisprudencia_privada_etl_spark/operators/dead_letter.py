"""Dead-letter requeue: reprocess rows the validation gate rejected.

The replay's F10 channel (plans/replay.py) diverts invalid rows to
``<table>/_dead_letter/epoch=N`` instead of failing the job — the engine
analog of the reference's ``update.file_errors`` side-channel
(/root/reference/src/sharepoint/sharepoint.ts:392-396) whose entries an
operator fixes and re-drives.  This module closes that loop:

1. ``dead_letter_epochs`` / ``read_dead_letters`` — enumerate and load the
   unconsumed channel (driver-side dir listing; one parquet scan).
2. ``requeue_dead_letters`` — apply an optional ``repair`` transform, then
   replay the rows through the NORMAL epoch path (``process_epoch`` with
   validation on) as the next epoch:

   * rows the repair actually fixed merge with their ORIGINAL ordinals, so
     the LWW guard arbitrates against anything that arrived meanwhile — a
     requeued update older than the live row correctly loses, a key the
     table never saw correctly lands;
   * rows still failing validation re-enter the dead-letter channel under
     the requeue epoch — the loop never drops a row on the floor;
   * consumed source dirs get a ``_REQUEUED`` marker (written only AFTER
     the merge commits) and are skipped by later enumerations.

Crash contract: a crash after the merge commit but before the marker write
re-requeues the same rows into another epoch; replaying an already-applied
(key, ordinal) is a no-op under the strict ``s.ordinal > t.ordinal`` merge
guard, so the loop is convergent, not exactly-once-by-bookkeeping.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEAD_LETTER_DIR = "_dead_letter"
# Enrichment (sidecar-parse) failures live in their OWN subchannel: their
# rows are (folder, file_index, error), not changelog rows, and must never
# be swept into requeue_dead_letters' merge loop by an epochs=None requeue
# (ADVICE r05).  They are re-driven by re-parsing repaired file bytes.
SIDECAR_DEAD_LETTER_DIR = "_dead_letter_sidecar"
MARKER = "_REQUEUED"


def _channel_dir(table_path: str, channel: str = DEAD_LETTER_DIR) -> str:
    return os.path.join(table_path, channel)


def _dir_rows(d: str) -> int:
    """Row count of a parquet dir from footers only — driver-side pyarrow
    metadata reads, zero Spark jobs.  Every validated epoch writes a (often
    empty) dead-letter dir; enumeration must not surface the empty ones."""
    import pyarrow.parquet as pq

    n = 0
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            n += pq.read_metadata(os.path.join(d, f)).num_rows
    return n


def dead_letter_epochs(
    table_path: str, include_consumed: bool = False, channel: str = DEAD_LETTER_DIR
) -> list[int]:
    """Epochs whose dead-letter dir holds ≥1 row, unconsumed only by default.
    Pure driver-side listing + parquet-footer reads — zero Spark jobs.
    ``channel`` selects the validation channel (default) or
    ``SIDECAR_DEAD_LETTER_DIR`` for quarantined enrichment failures."""
    root = _channel_dir(table_path, channel)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if not name.startswith("epoch="):
            continue
        if not include_consumed and os.path.exists(os.path.join(root, name, MARKER)):
            continue
        if _dir_rows(os.path.join(root, name)) == 0:
            continue
        out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_dead_letters(
    spark: SparkSession, table_path: str, epochs: list[int] | None = None,
    channel: str = DEAD_LETTER_DIR,
) -> DataFrame:
    """Load dead-lettered rows (``error`` column included) tagged with
    ``_src_epoch``.  ``epochs=None`` loads every unconsumed epoch."""
    eps = epochs if epochs is not None else dead_letter_epochs(table_path, channel=channel)
    root = _channel_dir(table_path, channel)
    # pair BEFORE filtering missing dirs — a post-filter zip would shift
    # every later epoch's _src_epoch label onto the wrong rows
    pairs = [
        (e, d)
        for e in eps
        if os.path.isdir(d := os.path.join(root, f"epoch={e}"))
    ]
    if not pairs:
        raise ValueError(f"no dead-letter epochs to read at {root} (epochs={epochs})")
    parts = []
    for e, d in pairs:
        parts.append(spark.read.parquet(d).withColumn("_src_epoch", F.lit(e)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def requeue_dead_letters(
    spark: SparkSession,
    sink,
    cfg=None,
    repair: Callable[[DataFrame], DataFrame] | None = None,
    epochs: list[int] | None = None,
) -> dict:
    """Repair + replay unconsumed dead letters as the next epoch.

    ``repair`` maps the dead frame (with ``error``/``_src_epoch``) to a
    fixed changelog frame; default drops the bookkeeping columns and
    resubmits as-is (right when the VALIDATOR was wrong, e.g. an op kind
    newly added to ``supported_ops``).  Validation is forced ON for the
    requeue epoch regardless of ``cfg.validate`` so still-broken rows go
    back to the channel instead of corrupting the table.
    """
    from jurisprudencia_privada_etl_spark.plans.replay import (
        ReplayConfig,
        process_epoch,
    )

    eps = epochs if epochs is not None else dead_letter_epochs(sink.table_path)
    if not eps:
        return {"requeued_epochs": [], "skipped": True}
    batch = read_dead_letters(spark, sink.table_path, eps)
    if repair is not None:
        batch = repair(batch)
    batch = batch.drop("error", "_src_epoch")

    cfg = cfg or ReplayConfig()
    if not cfg.validate:
        import dataclasses

        cfg = dataclasses.replace(cfg, validate=True)
    epoch = sink.last_committed_epoch() + 1
    if "epoch" in batch.columns:
        batch = batch.withColumn("epoch", F.lit(epoch))
    r = process_epoch(spark, sink, batch, epoch, cfg)
    # markers only after the commit: a crash before this point re-requeues,
    # which the ordinal guard turns into a no-op (module docstring)
    for e in eps:
        marker = os.path.join(_channel_dir(sink.table_path), f"epoch={e}", MARKER)
        with open(marker, "w") as f:
            json.dump({"requeued_to_epoch": epoch}, f)
    r["requeued_epochs"] = eps
    r["requeue_epoch"] = epoch
    return r

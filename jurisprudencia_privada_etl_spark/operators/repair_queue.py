"""Persistent repair/reintroduction queue (SURVEY.md §2.1 S7).

The reference keeps "reintroduction markers" for documents that were indexed
before a dependency (the per-folder sidecar table) was available; a later
pass loads the markers, groups them, re-processes the documents with the
now-present sidecar, and CLEARS the markers
(reference src/sharepoint/sharepoint.ts:159-193).

Engine analog: a marker table under ``<table>/_repair_queue/batch=N``
(append-only parquet batches), plus ``process_repair_queue``:

    1. load all marker batches → distinct keys;
    2. semi-join the stored changelog on those keys, LWW → latest live row
       per key (the same winners the original epochs produced);
    3. re-run extraction with the late dependency available (caller-supplied
       ``enrich`` hook, e.g. the sidecar join);
    4. replace exactly those keys in the lake table (bucket-pruned
       copy-on-write rewrite, ordinal retained — NOT a new epoch: repair
       recomputes derived fields, it does not advance event time);
    5. clear the consumed marker batches.

Crash-safety: clearing happens only AFTER the rewrite's manifest publish.
A crash in between leaves the markers in place and the repair re-runs
idempotently (same inputs → same rows → same table state).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.plans import manifest as mf
from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN, HadoopParquetSink, bucket_of
from jurisprudencia_privada_etl_spark.schemas import KEY_COLUMNS

QUEUE_DIR = "_repair_queue"


def _qdir(table_path: str) -> str:
    return os.path.join(table_path, QUEUE_DIR)


def list_batches(table_path: str) -> list[int]:
    d = _qdir(table_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(d)
        if name.startswith("batch=") and not name.endswith(".tmp")
    )


def enqueue(keys: DataFrame, table_path: str, reason: str) -> int:
    """Append one marker batch (repo, path, reason).  Batches are numbered
    sequentially; the write goes to a .tmp dir renamed into place so a
    half-written batch is never loaded.

    Concurrency: batch ids are claimed by the atomic rename itself — two
    enqueuers that list the same next id race on the rename, the loser gets
    EEXIST/ENOTEMPTY and retries with the next id (the .tmp dir is written
    once and only renamed, so no re-write per retry).  Single-writer remains
    the expected deployment (the replay loop drains the queue serially)."""
    batches = list_batches(table_path)
    n = (batches[-1] + 1) if batches else 0
    tmp = os.path.join(_qdir(table_path), f"batch-{os.getpid()}-{n}.tmp")
    keys.select(*KEY_COLUMNS).distinct().withColumn("reason", F.lit(reason)).write.mode(
        "overwrite"
    ).parquet(tmp)
    while True:
        final = os.path.join(_qdir(table_path), f"batch={n}")
        try:
            os.rename(tmp, final)
            return n
        except OSError:
            if os.path.isdir(final):  # lost the race — claim the next id
                n += 1
                continue
            shutil.rmtree(tmp, ignore_errors=True)  # stranded .tmp cleanup
            raise


def load_queue(spark: SparkSession, table_path: str) -> tuple[DataFrame | None, list[int]]:
    """All pending markers + the batch ids they came from (for clearing)."""
    batches = list_batches(table_path)
    if not batches:
        return None, []
    dirs = [os.path.join(_qdir(table_path), f"batch={b}") for b in batches]
    return spark.read.parquet(*dirs), batches


def clear(table_path: str, batches: list[int]) -> None:
    """Remove consumed marker batches (the reference's marker clear,
    sharepoint.ts:189-193)."""
    for b in batches:
        shutil.rmtree(os.path.join(_qdir(table_path), f"batch={b}"), ignore_errors=True)


def replace_keys(sink: HadoopParquetSink, rows: DataFrame) -> dict:
    """Copy-on-write rewrite of exactly the buckets containing ``rows``'
    keys: existing rows for those keys are dropped, ``rows`` take their
    place, every other row carries over.  Ordinals are preserved by the
    caller (repair is not an event).  Publishes a new manifest version;
    last_committed_epoch is unchanged."""
    m = sink.manifest()
    new_version = m.version + 1
    u = rows.withColumn(BUCKET_COLUMN, bucket_of(m.n_buckets))
    touched = sorted(r[BUCKET_COLUMN] for r in u.select(BUCKET_COLUMN).distinct().collect())
    if not touched:
        return {"repaired_buckets": 0, "version": m.version}
    target = sink.load(buckets=touched, include_tombstones=True)
    kept = target.join(u.select(*KEY_COLUMNS), list(KEY_COLUMNS), "left_anti")
    merged = kept.unionByName(u.select(*kept.columns))
    data_rel, data_dir = sink._new_data_dir(new_version)
    (
        merged.repartition(max(1, len(touched)), BUCKET_COLUMN)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COLUMN)
        .parquet(data_dir)
    )
    live = {
        int(name.split("=", 1)[1])
        for name in os.listdir(data_dir)
        if name.startswith(f"{BUCKET_COLUMN}=")
    }
    buckets = dict(m.buckets)
    for b in touched:
        if b in live:
            buckets[str(b)] = {
                "path": os.path.join(data_rel, f"{BUCKET_COLUMN}={b}"),
                "schema_version": new_version,
            }
        else:
            buckets.pop(str(b), None)
    mf.publish(
        sink.table_path,
        mf.Manifest(
            version=new_version,
            last_committed_epoch=m.last_committed_epoch,
            schema=m.schema,
            buckets=buckets,
            n_buckets=m.n_buckets,
            metrics={"repair_buckets": len(touched)},
            parent_version=m.version,
        ),
    )
    return {"repaired_buckets": len(touched), "version": new_version}


def process_repair_queue(
    spark: SparkSession,
    sink: HadoopParquetSink,
    changelog: DataFrame,
    enrich,
    run_extraction: bool = True,
    default_year: int = 2026,
) -> dict:
    """Drain the queue: re-derive the queued keys' latest live rows from the
    changelog, re-run the FULL extraction stage on them (so every derived
    column — fingerprint, title_norm, n_tokens, area… — is recomputed, not
    null-regressed), apply ``enrich(rows) -> rows`` on top (the late
    dependency — e.g. a sidecar join that failed at original index time),
    replace those keys in the table, clear the markers.  Ordinals pass
    through unchanged.  Set ``run_extraction=False`` only when ``enrich``
    itself produces every derived column."""
    from jurisprudencia_privada_etl_spark.extraction import extraction_stage
    from jurisprudencia_privada_etl_spark.operators.lww import lww_dedup

    queue, batches = load_queue(spark, sink.table_path)
    if queue is None:
        return {"repaired_keys": 0, "cleared_batches": 0}
    keys = queue.select(*KEY_COLUMNS).distinct()
    events = changelog.join(keys, list(KEY_COLUMNS), "left_semi")
    winners = lww_dedup(events, list(KEY_COLUMNS), "ordinal").where(F.col("op") != "D")
    if run_extraction:
        winners = extraction_stage(winners, default_year)
    # align to the CURRENT target schema: recompute the payload the sink
    # stores for these keys, with the late dependency available this time
    current = sink.load(buckets=None, include_tombstones=True).limit(0)
    rows = enrich(winners)
    for c in current.columns:
        if c not in rows.columns and c != BUCKET_COLUMN:
            rows = rows.withColumn(c, F.lit(None).cast(dict(current.dtypes)[c]))
    rows = rows.select([c for c in current.columns if c != BUCKET_COLUMN]).persist()
    try:
        n_keys = rows.select(*KEY_COLUMNS).distinct().count()
        res = replace_keys(sink, rows)
    finally:
        rows.unpersist()
    clear(sink.table_path, batches)
    return {"repaired_keys": n_keys, "cleared_batches": len(batches), **res}

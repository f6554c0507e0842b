"""Anti-entropy replica repair: per-bucket digests → targeted bucket sync.

The replication loop (snapshot bootstrap + change-feed apply,
operators/change_feed.py) keeps a replica converged as long as every feed
window is applied in order.  Real deployments also need the OTHER half of
the story — detecting and healing a replica that has silently drifted
(missed feed window, partial restore, rogue local write, bit rot) without
re-shipping the whole table.  This module is the Merkle-/anti-entropy
repair analog (Cassandra ``nodetool repair``, DynamoDB replica sync),
re-expressed on the engine's bucketed manifest:

* ``bucket_digests`` — ONE scan of the live snapshot (tombstones included:
  a replica that lost a tombstone will resurrect the key on the next stale
  event, so deleted-row state is part of convergence), aggregated per
  stored bucket with the same order/partitioning-independent two-fold
  digest as ``operators/fsck.table_digest``.  Output is ``n_buckets`` rows
  — at 100 TB the comparison payload is KBs, the scan is map-side combined
  and shuffles only the 128-row digest table.
* ``diverged_buckets`` — full-outer-compare of the two digest frames
  (driver-side: the frames are manifest-sized, never data-sized).
* ``repair_replica`` — bucket-pruned read of ONLY the divergent buckets
  from the primary (``load(buckets=...)`` skips every clean bucket's
  files), written verbatim into the replica and published through the
  replica's ordinary manifest CAS as ``operation="repair"``.  Rows are
  copied byte-for-byte — ordinals, tombstones, content_sha and all — so
  the repaired replica's future feed application keeps the exact LWW
  semantics of a replica that never diverged (a merge-path repair that
  re-stamped ordinals would make repaired rows reject legitimate future
  updates).  Re-running repair on a converged pair is a no-op (no new
  version), which makes the loop idempotent and crash-safe.

Scale shape: detection costs two single scans (each side) + a 128-row
compare; healing costs IO proportional to the DIVERGED byte volume only.
A 100 TB replica with one corrupt bucket re-ships ~1/n_buckets of the
table, not the table.

Reference parity note: the reference has no replication story (its state
lives in one Elasticsearch index, juris.ts:1-23); this extends the north
rule's row-for-row-equality contract (BASELINE.json) from a one-shot
assertion into a continuously enforceable invariant.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.fsck import row_digest


def bucket_digests(sink, version: int | None = None) -> DataFrame:
    """Per-bucket state digest of a HadoopParquetSink table.

    Returns ``(bucket int, n_rows bigint, digest_xor bigint,
    digest_sum string)`` — one row per non-empty bucket.  The digest
    projection is EVERY stored column (payload, LWW bookkeeping and the
    derived extraction fields alike): two buckets digest-equal ⇒ their
    full replicated state (ordinals and retained tombstones included) is
    row-for-row identical with overwhelming probability.
    """
    from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN

    live = sink.load(include_tombstones=True, version=version)
    cols = [c for c in live.columns if c != BUCKET_COLUMN]
    h56 = F.conv(F.substring(row_digest(*cols), 1, 14), 16, 10).cast("long")
    return (
        live.select(F.col(BUCKET_COLUMN).cast("int").alias("bucket"), h56.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.bit_xor("h"), F.lit(0)).alias("digest_xor"),
            F.coalesce(
                F.sum(F.col("h").cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
            )
            .cast("string")
            .alias("digest_sum"),
        )
    )


def _digest_map(df: DataFrame) -> dict[int, tuple]:
    return {
        r["bucket"]: (r["n_rows"], r["digest_xor"], r["digest_sum"])
        for r in df.collect()
    }


def diverged_buckets(primary, replica) -> list[int]:
    """Buckets whose replicated state differs between the two tables.

    Requires identical bucketing (same ``n_buckets`` — the digest
    partitions rows by the stored bucket id, so differently-bucketed
    tables group rows differently; ``rebucket`` the replica first) and an
    identical current schema (repair across schema drift is a
    re-bootstrap, not a bucket sync).
    """
    mp, mr = primary.manifest(), replica.manifest()
    if mp.n_buckets != mr.n_buckets:
        raise ValueError(
            f"bucket layouts differ (primary {mp.n_buckets}, replica "
            f"{mr.n_buckets}); rebucket the replica to match before repair"
        )
    if mp.schema.to_json() != mr.schema.to_json():
        raise ValueError(
            "schemas differ between primary and replica; apply the schema "
            "evolution (or re-bootstrap) before anti-entropy repair"
        )
    dp = _digest_map(bucket_digests(primary))
    dr = _digest_map(bucket_digests(replica))
    return sorted(b for b in set(dp) | set(dr) if dp.get(b) != dr.get(b))


def repair_replica(primary, replica, dry_run: bool = False) -> dict[str, Any]:
    """Heal ``replica`` to match ``primary``, touching only divergent buckets.

    Protocol: compare per-bucket digests; bucket-pruned read of the
    divergent buckets from the primary (clean buckets' files are never
    opened); write those rows verbatim (ordinals/tombstones preserved)
    into a fresh tokenized data dir on the replica; publish ONE new
    replica manifest version re-pointing exactly the divergent bucket
    entries (clearing any merge-on-read delta stacks — the copied base is
    already resolved).  A divergent bucket that is EMPTY on the primary is
    dropped from the replica's manifest.  ``last_committed_epoch`` is left
    untouched: repair converges *state*; the replay/feed cursor advances
    through the ordinary apply path, whose re-application the LWW ordinal
    guard absorbs.

    No divergence ⇒ no write, no new version (idempotent).
    """
    from jurisprudencia_privada_etl_spark.plans import manifest as mf
    from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN

    div = diverged_buckets(primary, replica)
    if dry_run or not div:
        return {"diverged_buckets": div, "repaired_buckets": 0, "rows_copied": 0}

    import os

    m = replica.manifest()
    new_version = m.version + 1
    rows = primary.load(buckets=div, include_tombstones=True)
    data_rel, data_dir = replica._new_data_dir(new_version)
    rows.repartition(max(1, len(div)), BUCKET_COLUMN).write.mode("overwrite").options(
        **replica._bloom_options()
    ).partitionBy(BUCKET_COLUMN).parquet(data_dir)
    written = {
        int(name.split("=", 1)[1])
        for name in os.listdir(data_dir)
        if name.startswith(f"{BUCKET_COLUMN}=")
    }
    rows_copied = 0
    buckets = dict(m.buckets)
    for b in div:
        if b in written:
            rel = os.path.join(data_rel, f"{BUCKET_COLUMN}={b}")
            buckets[str(b)] = {"path": rel, "schema_version": new_version}
            import pyarrow.parquet as pq

            rows_copied += sum(
                pq.read_metadata(os.path.join(replica.table_path, rel, f)).num_rows
                for f in os.listdir(os.path.join(replica.table_path, rel))
                if f.endswith(".parquet")
            )
        else:  # primary holds no rows for this bucket — drop the stale entry
            buckets.pop(str(b), None)
    mf.publish(
        replica.table_path,
        mf.Manifest(
            version=new_version,
            last_committed_epoch=m.last_committed_epoch,
            schema=m.schema,
            buckets=buckets,
            n_buckets=m.n_buckets,
            metrics={
                "operation": "repair",
                "diverged_buckets": div,
                "rows_copied": rows_copied,
            },
            parent_version=m.version,
        ),
    )
    return {
        "diverged_buckets": div,
        "repaired_buckets": len(div),
        "rows_copied": rows_copied,
    }

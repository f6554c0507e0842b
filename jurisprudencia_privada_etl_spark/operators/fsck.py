"""Table integrity audit (fsck) + engine-portable state digest.

The north rule's correctness gate is "final table matches the reference's
replayed state row-for-row with per-row content sha256 equality"
(BASELINE.json north_star; reference identity chain aux.ts:101-113,
sharepoint.ts:266-268).  Checking that row-for-row across engines, replicas,
or 1000 executors must not require collecting either table:

* ``table_digest`` — ONE full scan, order-independent, partitioning-
  independent: per row, sha256 over a canonical NUL-joined projection
  (nulls → ''), folded two ways — ``bit_xor`` of the first 56 bits and a
  decimal ``sum`` of the same 56 bits.  Equal digests + equal counts ⇒
  row-for-row equality with overwhelming probability; either fold alone
  has cheap adversarial collisions (xor: any row repeated twice cancels;
  sum: swapped digits), together they don't happen by accident.  The
  projection is plain ANSI SQL (sha256/substring/conv), so ANY engine —
  DuckDB, Trino, a replica of this engine — computes the identical value;
  that is what makes it a cross-system replication check rather than a
  Spark-internal one.
* ``fsck`` — physical audit of a HadoopParquetSink table: every
  manifest-referenced data dir exists and its parquet footers are
  readable (driver-side, zero Spark jobs); then one Spark pass over the
  live snapshot verifying the two invariants a bucketed CDC table must
  hold — every row lives in the bucket ``pmod(xxhash64(repo, path),
  n_buckets)`` says it should (a misplaced row silently escapes every
  future bucket-pruned merge/lookup: corruption that reads clean), and
  the primary key (repo, path) is unique among live rows.

At 100 TB both Spark-side checks are single-scan aggregations with
map-side partial combine — no shuffle proportional to data, only to the
(tiny) violation set and the 1-row digest.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(*cols: Column | str) -> Column:
    """sha256 hex of the canonical NUL-joined projection (nulls → '').
    Same construction as functions.hashing.canonical_hash — restated here
    with the cross-engine contract: ANSI ``sha256(concat_ws(...))``."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.sha2(F.concat_ws("\x00", *parts), 256)


def table_digest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-row, order/partitioning-independent state digest of ``df``.

    Returns ``(n_rows bigint, digest_xor bigint, digest_sum string)``.
    56 bits per row (14 hex chars = 7 whole bytes, the widest slice whose
    hex→int conversion exists on both engines and stays positive in a
    signed int64); the sum fold accumulates in decimal(38,0) (~10^11 rows
    of headroom at 2^56 each) and is rendered as a string so engines with
    different wide-integer types compare equal.

    DuckDB twin (the oracle pairing / the cross-engine contract):

        SELECT count(*) AS n_rows,
               coalesce(bit_xor(from_hex(substr(sha256(proj), 1, 14))::BIT::BIGINT), 0)
                   AS digest_xor,
               CAST(coalesce(sum(from_hex(substr(sha256(proj), 1, 14))::BIT::HUGEINT), 0)
                    AS VARCHAR) AS digest_sum
        FROM (SELECT concat_ws(chr(0), coalesce(c1, ''), ...) AS proj FROM t)
    """
    use = cols if cols is not None else df.columns
    h56 = F.conv(F.substring(row_digest(*use), 1, 14), 16, 10).cast("long")
    return df.select(h56.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.bit_xor("h"), F.lit(0)).alias("digest_xor"),
        F.coalesce(
            F.sum(F.col("h").cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        )
        .cast("string")
        .alias("digest_sum"),
    )


def digests_equal(a: DataFrame, b: DataFrame) -> bool:
    """Driver-side comparison of two ``table_digest`` results (two 1-row
    collects).  The replica-equality primitive: run ``table_digest`` on the
    primary and on the replica (any engine) and compare here."""
    ra, rb = a.collect()[0], b.collect()[0]
    return (
        ra["n_rows"] == rb["n_rows"]
        and ra["digest_xor"] == rb["digest_xor"]
        and ra["digest_sum"] == rb["digest_sum"]
    )


def fsck(sink, digest_columns: list[str] | None = None) -> dict[str, Any]:
    """Physical + logical audit of a HadoopParquetSink table.

    Phase 1 (driver, zero Spark jobs): every bucket entry in the current
    manifest — including merge-on-read delta refs — must point at an
    existing dir whose ``*.parquet`` footers open; footer row counts are
    collected as a byproduct.  This is metadata-proportional (one footer
    read per data file, ~KBs each); for tables whose file count outgrows a
    driver loop, lift the same check onto executors with
    ``spark.read.format("binaryFile")`` over the manifest's paths — the
    per-file validation is embarrassingly parallel.

    Phase 2 (one Spark scan of the live snapshot):
      * misbucketed rows — stored bucket ≠ ``pmod(xxhash64(repo, path),
        n_buckets)``; MUST be 0 or bucket-pruned merges/lookups silently
        miss the row forever,
      * duplicate live primary keys — ``(repo, path)`` appearing twice;
        MUST be 0 or LWW state is ambiguous,
      * ``table_digest`` over ``digest_columns`` (default: every live
        column) for replica comparison.

    Returns a report dict; ``ok`` is True iff every check passed.
    """
    from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN, bucket_of

    import pyarrow.parquet as pq

    m = sink.manifest()
    missing: list[str] = []
    bad_footers: list[str] = []
    footer_rows = 0
    refs: list[str] = []
    for entry in m.buckets.values():
        refs.append(entry["path"])
        refs.extend(d["path"] for d in entry.get("deltas") or [])
        # position-delete sets are referenced files too: a missing DV dir
        # silently resurrects its deleted rows, so audit their existence
        # and footers exactly like data refs
        refs.extend(d["path"] for d in entry.get("dvs") or [])
    for rel in refs:
        d = os.path.join(sink.table_path, rel)
        if not os.path.isdir(d):
            missing.append(rel)
            continue
        for fname in os.listdir(d):
            if not fname.endswith(".parquet"):
                continue
            try:
                footer_rows += pq.read_metadata(os.path.join(d, fname)).num_rows
            except Exception:
                bad_footers.append(os.path.join(rel, fname))

    report: dict[str, Any] = {
        "version": m.version,
        "referenced_dirs": len(refs),
        "missing_dirs": missing,
        "unreadable_footers": bad_footers,
        "footer_rows": footer_rows,
    }
    if missing or bad_footers:
        report["ok"] = False
        return report  # phase 2 would crash on the missing files

    # load() always carries the stored bucket id (partition-dir column)
    live = sink.load()
    misbucketed = live.where(F.col(BUCKET_COLUMN) != bucket_of(m.n_buckets)).count()

    dup_keys = (
        live.groupBy("repo", "path")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    cols = digest_columns or [c for c in live.columns if c != BUCKET_COLUMN]
    dig = table_digest(live.select(*cols), cols).collect()[0]
    report.update(
        misbucketed_rows=misbucketed,
        duplicate_keys=dup_keys,
        n_rows=dig["n_rows"],
        digest_xor=dig["digest_xor"],
        digest_sum=dig["digest_sum"],
        digest_columns=cols,
        ok=(misbucketed == 0 and dup_keys == 0),
    )
    return report

"""Changelog storage: epoch-partitioned parquet with pruned epoch reads.

The reference resumes its delta walk from a saved ``next_link``/``delta_link``
token (src/sharepoint/sharepoint.ts:149, 408).  Here the source of truth is an
epoch-partitioned table; "resume" = read only epochs beyond the manifest's
``last_committed_epoch``.  Partitioning by ``epoch`` makes that a partition-
pruned scan (SURVEY.md §4 P1): ``WHERE epoch = E`` touches exactly one
directory, regardless of total changelog size — the property that keeps a
10^10-event changelog tail O(epoch), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_changelog(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a changelog partitioned by epoch (hive-style directories).

    A ``_content_bytes`` column (payload size, computed once at write time)
    is stored alongside the events: the per-epoch lineage/stats pass
    (``HadoopParquetSink.key_stats``) then reads THREE small columns instead
    of decompressing the whole ``content`` column a second time — at
    10^10 events that pass would otherwise re-scan the entire payload
    volume once per epoch.  Changelogs from other writers simply lack the
    column and key_stats falls back to ``octet_length(content)``.

    Appends conform to the EXISTING table's schema: mixing files with and
    without ``_content_bytes`` under one path would make the stats pass
    depend on which footer Spark resolves (nulls silently undercounting
    byte lineage, or the fast path silently off) — a pre-fast-path
    changelog therefore stays uniformly without the column, and the
    consumer's ``octet_length`` fallback stays correct for every row.
    """
    if mode == "append":
        try:
            existing = set(df.sparkSession.read.parquet(path).schema.fieldNames())
        except Exception:  # first write: path doesn't exist yet
            existing = None
        if existing is not None and "_content_bytes" not in existing:
            df = df.drop("_content_bytes")
            df.write.mode(mode).partitionBy("epoch").parquet(path)
            return
    if "content" in df.columns and "_content_bytes" not in df.columns:
        df = df.withColumn("_content_bytes", F.octet_length("content"))
    df.write.mode(mode).partitionBy("epoch").parquet(path)


def read_epoch(
    spark: SparkSession, path: str, epoch: int, merge_schema: bool = False
) -> DataFrame:
    """Partition-pruned scan of a single epoch.

    ``merge_schema`` handles changelogs whose later epochs carry evolved
    columns (schema-evolution epochs, SURVEY.md T6): parquet footer merging
    surfaces the union schema so the new columns are readable.  Off by
    default — footer merging scans every file's metadata, which a 10^10-event
    changelog cannot afford on non-evolution epochs.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path).where(F.col("epoch") == epoch)


def read_epochs_after(spark: SparkSession, path: str, last_committed: int) -> DataFrame:
    """All pending epochs (> last_committed) — still partition-pruned."""
    return spark.read.parquet(path).where(F.col("epoch") > last_committed)


def list_epochs(spark: SparkSession, path: str) -> list[int]:
    """Distinct epochs present, ascending.  Reads partition values only."""
    rows = spark.read.parquet(path).select("epoch").distinct().collect()
    return sorted(r["epoch"] for r in rows)

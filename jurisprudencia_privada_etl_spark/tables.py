"""Shared parquet-table reader for the query catalog.

``spark.read.parquet(path)`` runs a driver-side schema-inference pass
(footer read via a tiny Spark job) on EVERY call — ~65 ms each at sandbox
scale, paid once or more per declared query.  The schemas of the driver's
tables are immutable per data directory, so they are memoized here keyed
on the concrete file path and re-applied with ``read.schema(...)`` (~14 ms).

This caches METADATA only — never rows, never query results: every query
invocation still scans the parquet files.  It is the in-process analog of
a table catalog holding the schema (exactly what Hive/Iceberg/Delta give
Spark at scale, where scans also skip per-query inference).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SCHEMA_CACHE: dict[str, T.StructType] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = sch
    return spark.read.schema(sch).parquet(path)


# One scan split is the parallelism floor of a parquet read: a file below
# ~maxPartitionBytes usually holds a single row group, so byte-range
# splitting cannot spread it and every downstream map expression runs on
# ONE core.  For expression-heavy map pipelines (hashing, regex chains,
# JSON serde) the guide's input-skew remedy applies: "one huge
# unsplittable file … repartition immediately after the read" (§2.5).
_FAN_OUT_MAX_BYTES = 32 << 20


def table_bytes(sf_dir: str, name: str) -> int:
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, files in os.walk(path)
            for f in files
        )
    return os.path.getsize(path)


def fan_out_small_scan(
    spark: SparkSession, df: DataFrame, input_bytes: int, max_bytes: int = _FAN_OUT_MAX_BYTES
) -> DataFrame:
    """Round-robin repartition of a sub-split-sized input across cores.

    STRICTLY size-gated: only inputs small enough to fit well inside one
    scan split (default gate 32 MB, a quarter of ``maxPartitionBytes``)
    are fanned out, so the added exchange is bounded by the gate at any
    deployment size and production-scale inputs — which already split —
    are untouched (no shuffle added at 100 TB; this is NOT a blanket
    "repartition for parallelism", which guide §2.4 rightly bans).
    Round-robin is retry-safe: Spark sorts before round-robin
    repartition (SPARK-23207) so re-run tasks reproduce the same
    assignment."""
    if input_bytes > max_bytes:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)

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

"""Reconciliation / repair pass + dead-letter channel.

Reference analogs:
  * scanFolderForMissingFiles (sharepoint.ts:344-398) + the reintroduction
    queue (sharepoint.ts:159-193): "what should be indexed but isn't" →
    re-ingest.  Here: one anti-join of expected keys against the target.
  * logDocumentProcessingError side-channel (sharepoint.ts:392-396, 440-445,
    stored at :181): failed rows are recorded, the run continues.  Here: a
    dead-letter DataFrame produced by validation filters — invalid rows never
    abort the job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jurisprudencia_privada_etl_spark.schemas import KEY_COLUMNS


def missing_keys(expected: DataFrame, target: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Keys present in the expected listing but absent from the target —
    the repair set (left_anti, J4/S6)."""
    keys = key_cols or KEY_COLUMNS
    return expected.select(*keys).distinct().join(target.select(*keys), keys, "left_anti")


def orphan_keys(target: DataFrame, expected: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Keys in the target that the source no longer lists (candidates for
    tombstoning in a full reconcile — the reference's missing '--full'
    deletion pass, README.md:18)."""
    keys = key_cols or KEY_COLUMNS
    return target.select(*keys).distinct().join(expected.select(*keys), keys, "left_anti")


# -- validation + dead-letter (F8/F9/F10) -------------------------------------

def split_valid(
    df: DataFrame,
    required_cols: list[str],
    supported_ops: tuple[str, ...] = ("I", "U", "D"),
) -> tuple[DataFrame, DataFrame]:
    """Validate shape: required fields non-null, op in the supported set.

    Returns (valid, dead_letter) — dead_letter carries an ``error`` column.
    The reference throws per item and catches into update.file_errors
    (sharepoint.ts:595-610, 392-396); here violations become rows, not
    exceptions, and the job never stops.
    """
    checks = [
        (F.col(c).isNull(), f"missing required field: {c}") for c in required_cols
    ]
    if "op" in df.columns:
        # isNull first: ``~isin`` evaluates to NULL (not true) for a null op,
        # which would let null-op rows sail through the where() below.
        checks.append(
            (F.col("op").isNull() | ~F.col("op").isin(*supported_ops), "unsupported op")
        )
    err = F.lit(None).cast("string")
    for cond, msg in reversed(checks):
        err = F.when(cond, F.lit(msg)).otherwise(err)
    tagged = df.withColumn("error", err)
    valid = tagged.where(F.col("error").isNull()).drop("error")
    dead = tagged.where(F.col("error").isNotNull())
    return valid, dead


def dead_letter_map_in_pandas(df: DataFrame, fn, out_fields: list[T.StructField]):
    """Wrap a per-batch pandas transform so row-level failures emit
    (row-identifier, error) rows instead of failing the task (F10).

    ``fn(pdf) -> pdf`` may raise per batch; a failing batch is retried
    row-at-a-time so only genuinely bad rows land in the dead letter.
    Returns (ok DataFrame, dead DataFrame built on key columns + error).
    """
    ok_schema = T.StructType(out_fields)
    err_schema = T.StructType(
        [f for f in df.schema.fields if f.name in KEY_COLUMNS]
        + [T.StructField("error", T.StringType(), True)]
    )

    def run_ok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                yield fn(pdf)[ok_schema.fieldNames()]
            except Exception:
                good = []
                for i in range(len(pdf)):
                    row = pdf.iloc[[i]]
                    try:
                        good.append(fn(row))
                    except Exception:
                        continue
                if good:
                    yield pd.concat(good)[ok_schema.fieldNames()]

    def run_err(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                fn(pdf)
            except Exception:
                for i in range(len(pdf)):
                    row = pdf.iloc[[i]]
                    try:
                        fn(row)
                    except Exception as e:  # noqa: PERF203
                        yield row[KEY_COLUMNS].assign(error=f"{type(e).__name__}: {e}")

    return df.mapInPandas(run_ok, ok_schema), df.mapInPandas(run_err, err_schema)

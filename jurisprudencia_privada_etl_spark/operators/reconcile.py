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
    check_constraints: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Validate shape: required fields non-null, op in the supported set,
    plus optional declarative CHECK constraints.

    Returns (valid, dead_letter) — dead_letter carries an ``error`` column.
    The reference throws per item and catches into update.file_errors
    (sharepoint.ts:595-610, 392-396); here violations become rows, not
    exceptions, and the job never stops.

    ``check_constraints``: name → SQL predicate over the batch's columns
    (the Delta Lake ``ADD CONSTRAINT ... CHECK`` semantics at the ingest
    gate).  Standard SQL CHECK three-valued logic: a row violates only when
    the predicate evaluates to FALSE — NULL (unknown) passes, exactly as in
    ANSI CHECK constraints; route NULLs explicitly (``x IS NOT NULL AND
    ...``) when unknown must fail.  Violations dead-letter with
    ``error = "check constraint violated: <name>"``; the expression chain
    is pure JVM (whole-stage codegen), so constraints ride the existing
    validation projection for free.
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
    for name, sql in (check_constraints or {}).items():
        # violated iff predicate == FALSE (NULL passes, per SQL CHECK)
        checks.append(
            (
                ~F.coalesce(F.expr(sql).cast("boolean"), F.lit(True)),
                f"check constraint violated: {name}",
            )
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

    SINGLE-PASS: one ``mapInPandas`` emits a union schema (``out_fields`` +
    ``error``); ok and dead are filters over that one tagged frame, so ``fn``
    runs exactly once per healthy batch.  A failing batch is retried
    row-at-a-time so only genuinely bad rows land in the dead letter — the
    only case where ``fn`` sees a row twice.

    ``fn(pdf) -> pdf`` must carry the key columns through to its output (it
    is a per-row transform; keys identify dead rows).  Returns
    (ok, dead, tagged): ok has ``out_fields``, dead has key columns +
    ``error``, ``tagged`` is the underlying union frame — persist it before
    consuming BOTH ok and dead, or Spark re-executes the plan (and ``fn``)
    once per consumer.
    """
    names = [f.name for f in out_fields]
    keys = [k for k in KEY_COLUMNS if k in df.columns and k in names]
    if [k for k in KEY_COLUMNS if k in df.columns] and not keys:
        raise ValueError(
            "out_fields must include the key columns "
            f"({[k for k in KEY_COLUMNS if k in df.columns]}) — dead-letter "
            "rows would otherwise carry no identity"
        )
    union_schema = T.StructType(
        list(out_fields) + [T.StructField("error", T.StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                res = fn(pdf)[names].copy()
                res["error"] = None
                yield res
            except Exception:
                parts = []
                for i in range(len(pdf)):
                    row = pdf.iloc[[i]]
                    try:
                        r = fn(row)[names].copy()
                        r["error"] = None
                        parts.append(r)
                    except Exception as e:  # noqa: PERF203
                        bad = pd.DataFrame({n: [None] for n in names})
                        for k in keys:
                            bad[k] = row[k].values
                        bad["error"] = f"{type(e).__name__}: {e}"
                        parts.append(bad)
                if parts:
                    yield pd.concat(parts, ignore_index=True)

    tagged = df.mapInPandas(run, union_schema)
    ok = tagged.where(F.col("error").isNull()).select(*names)
    dead = tagged.where(F.col("error").isNotNull()).select(*keys, "error")
    return ok, dead, tagged

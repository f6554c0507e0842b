"""Per-field conflicts report (SURVEY.md §2.1 S14).

The reference records a Current/New value pair for every exact-match field
that differs between the incoming update and the live indexed document, into
a dedicated conflicts index (reference src/report/report.ts:43-110 —
``createDocumentConflict`` with ``{Field, Current, New}`` entries).  The
engine's analog: for each epoch, winning updates are joined against the live
target rows they will overwrite, and every configured field whose value
differs becomes one ``(key, field, current, new, ordinal…)`` row written to
``<table>/_conflicts/epoch=N``.

Spark shape: one equi-join on the key (both sides shuffle on the key — the
update side is one epoch's LWW winners, the target side is pruned to the
touched buckets only, so the join input is bounded by the epoch's footprint,
not the table size), then an ``inline`` explode of a per-field struct array —
no Python, no per-field joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.schemas import KEY_COLUMNS


def conflict_report(
    target_live: DataFrame,
    updates: DataFrame,
    fields: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """(key…, field, current, new, target_ordinal, update_ordinal) rows.

    A conflict is a key where a WINNING update (strictly higher ordinal than
    the live target row, matching the MERGE guard) changes one of ``fields``.
    Tombstone updates are excluded — a delete is not a field conflict.
    Values are stringified so one report column serves every field type
    (the reference's report values are strings too, report.ts:52-57).
    """
    keys = key_cols or KEY_COLUMNS
    t = target_live.select(
        *keys,
        F.col("ordinal").alias("target_ordinal"),
        *[F.col(f).cast("string").alias(f"_t_{f}") for f in fields],
    )
    u = updates
    if "op" in u.columns:
        u = u.where(F.col("op") != "D")
    u = u.select(
        *keys,
        F.col("ordinal").alias("update_ordinal"),
        *[F.col(f).cast("string").alias(f"_u_{f}") for f in fields],
    )
    j = u.join(t, list(keys), "inner").where(
        F.col("update_ordinal") > F.col("target_ordinal")
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(f).alias("field"),
                F.col(f"_t_{f}").alias("current"),
                F.col(f"_u_{f}").alias("new"),
            )
            for f in fields
        ]
    )
    exploded = j.select(
        *keys, "target_ordinal", "update_ordinal", F.inline(pairs)
    )
    # differs, null-safely: NULL→'x', 'x'→NULL and 'x'→'y' all conflict
    return exploded.where(~F.col("current").eqNullSafe(F.col("new"))).select(
        *keys, "field", "current", "new", "target_ordinal", "update_ordinal"
    )

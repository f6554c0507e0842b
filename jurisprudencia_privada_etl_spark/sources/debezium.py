"""Debezium CDC envelope ingestion → the engine's normalized changelog.

The north rule's source is a "binlog/WAL tail"; the de-facto public
interchange for that is the Debezium envelope (Kafka Connect):

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "source": {"ts_ms":…, "lsn":…, "db":…, "table":…},
                 "op": "c"|"u"|"d"|"r", "ts_ms": …}}

``parse_debezium`` turns a DataFrame of such JSON strings (a Kafka topic's
``value`` column, a file dump, …) into rows of ``CHANGELOG_SCHEMA`` so the
entire replay pipeline (salt → extract → LWW → MERGE) runs unchanged on a
real CDC tail.  Entirely JVM-side (``from_json`` with a declared schema +
column expressions — no Python in the row path), so the parse stays inside
whole-stage codegen and scales with executor count.

Mapping:
  * op: c/r (create/snapshot-read) → I, u → U, d → D
  * row image: ``after``; for deletes ``before`` (Debezium leaves ``after``
    null on d)
  * ordinal: ``source.lsn`` when present (the WAL's total order), else
    ``payload.ts_ms`` — callers with neither must supply their own ordering
  * epoch: ``floor(ordinal / events_per_epoch)`` by default, or any caller
    expression (e.g. a Kafka partition-offset window)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jurisprudencia_privada_etl_spark.schemas import TARGET_SCHEMA


def debezium_envelope_schema(row_schema: T.StructType = TARGET_SCHEMA) -> T.StructType:
    """The typed envelope for ``from_json`` — declared, never inferred (a
    10^10-event tail cannot afford schema inference, and inference would
    silently widen on dirty rows instead of nulling them)."""
    row = T.StructType([T.StructField(f.name, f.dataType, True) for f in row_schema.fields])
    source = T.StructType(
        [
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("lsn", T.LongType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
        ]
    )
    payload = T.StructType(
        [
            T.StructField("before", row, True),
            T.StructField("after", row, True),
            T.StructField("source", source, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )
    return T.StructType([T.StructField("payload", payload, True)])


def parse_debezium(
    df: DataFrame,
    value_col: str = "value",
    row_schema: T.StructType = TARGET_SCHEMA,
    events_per_epoch: int = 1_000_000,
    epoch: Column | None = None,
) -> DataFrame:
    """Normalize Debezium envelopes to ``CHANGELOG_SCHEMA`` columns.

    Malformed JSON or envelopes missing ``payload.op`` yield null-op rows a
    caller can divert to the dead-letter channel (operators/reconcile.py
    ``split_valid``) — the parse itself never throws (from_json PERMISSIVE).
    """
    env = F.from_json(F.col(value_col), debezium_envelope_schema(row_schema))
    p = env.getField("payload")
    op_raw = p.getField("op")
    op = (
        F.when(op_raw.isin("c", "r"), F.lit("I"))
        .when(op_raw == "u", F.lit("U"))
        .when(op_raw == "d", F.lit("D"))
        .otherwise(F.lit(None).cast("string"))
    )
    image = F.when(op_raw == "d", p.getField("before")).otherwise(p.getField("after"))
    ordinal = F.coalesce(p.getField("source").getField("lsn"), p.getField("ts_ms"))
    # exact integer arithmetic — two traps hide here: long/int promotes to
    # double (loses integer precision above 2^53; pg_lsn is a full 64-bit
    # value), and decimal(38,0)/int rounds HALF_UP at scale 6 BEFORE floor()
    # (so lsn=9_999_999 with events_per_epoch=10_000_000 would round 0.9999999
    # up to 1.000000 and land in epoch 1).  Subtracting pmod first makes the
    # numerator an exact multiple, so the decimal division is exact.
    o = ordinal.cast("long")
    epoch_col = (
        epoch
        if epoch is not None
        else (
            (o - F.pmod(o, F.lit(events_per_epoch))).cast("decimal(38,0)")
            / F.lit(events_per_epoch)
        ).cast("long")
    )
    cols = [
        epoch_col.alias("epoch"),
        ordinal.cast("long").alias("ordinal"),
        op.alias("op"),
    ]
    cols += [image.getField(f.name).alias(f.name) for f in row_schema.fields]
    return df.select(*cols)


def to_debezium(
    feed: DataFrame,
    row_schema: T.StructType = TARGET_SCHEMA,
    keys: list[str] | None = None,
    db: str = "lake",
    table: str = "t",
) -> DataFrame:
    """CDC-out: serialize a change feed (Delta-CDF shape, from
    ``operators/change_feed``) to Debezium envelope JSON — the other half
    of the interchange ``parse_debezium`` consumes, so the engine's tables
    are a standards-shaped CDC *source* for any downstream consumer (Kafka
    Connect sinks, another instance of this engine, Debezium tooling).

    A feed is a snapshot diff, so each key carries at most one change;
    the update pre/post image pair folds into ONE envelope (Debezium
    semantics: ``before`` + ``after`` on a single ``u`` event) with one
    map-side-combining groupBy.  ``source.lsn`` carries the row ordinal —
    ``parse_debezium(to_debezium(feed))`` round-trips ordinals, ops and
    images exactly (property-tested), so a replica fed over the envelope
    converges identically to one fed ``feed_as_changelog`` directly.
    Entirely JVM-side (struct/when/to_json): no Python in the row path.

    Returns one column ``value`` (the JSON string), Kafka-producer shaped.
    """
    from jurisprudencia_privada_etl_spark.operators.change_feed import CHANGE_TYPE_COLUMN
    from jurisprudencia_privada_etl_spark.schemas import KEY_COLUMNS

    keys = keys or KEY_COLUMNS
    names = [f.name for f in row_schema.fields]
    ct = F.col(CHANGE_TYPE_COLUMN)
    img = F.struct(*[F.col(n) for n in names])
    null_img = F.lit(None).cast(
        T.StructType([T.StructField(f.name, f.dataType, True) for f in row_schema.fields])
    )
    pre = F.when(ct.isin("delete", "update_preimage"), img).otherwise(null_img)
    post = F.when(ct.isin("insert", "update_postimage"), img).otherwise(null_img)
    op = (
        F.when(ct == "insert", F.lit("c"))
        .when(ct == "delete", F.lit("d"))
        .otherwise(F.lit("u"))  # either update image row maps to one 'u'
    )
    agg = feed.groupBy(*keys).agg(
        F.max(F.struct(pre.isNotNull().alias("_has"), pre.alias("v"))).getField("v").alias("before"),
        F.max(F.struct(post.isNotNull().alias("_has"), post.alias("v"))).getField("v").alias("after"),
        F.max(op).alias("_op"),
        F.max(F.col("ordinal").cast("long")).alias("_lsn"),
    )
    envelope = F.struct(
        F.struct(
            F.col("before"),
            F.col("after"),
            F.struct(
                F.lit(None).cast("long").alias("ts_ms"),
                F.col("_lsn").alias("lsn"),
                F.lit(db).alias("db"),
                F.lit(table).alias("table"),
            ).alias("source"),
            F.col("_op").alias("op"),
            F.lit(None).cast("long").alias("ts_ms"),
        ).alias("payload")
    )
    return agg.select(F.to_json(envelope).alias("value"))

"""Dead-letter requeue loop: repair + replay through the normal epoch path,
still-broken rows re-enter the channel, consumed dirs are marked, and the
LWW ordinal guard arbitrates requeued rows against later arrivals."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.dead_letter import (
    dead_letter_epochs,
    read_dead_letters,
    requeue_dead_letters,
)
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import CHANGELOG_SCHEMA, TARGET_SCHEMA, TableSchema


def _mk(spark, rows):
    # nullable copy: the fixture deliberately smuggles a null key past
    # createDataFrame so the VALIDATOR (not the ingest layer) catches it
    from pyspark.sql import types as T

    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in CHANGELOG_SCHEMA.fields]
    )
    return spark.createDataFrame(rows, schema=nullable)


def _setup(spark, tmp_path):
    """Epoch 0: 2 good rows + 2 dead rows (bad op, null ordinal→null path)."""
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    cfg = ReplayConfig(validate=True)
    e0 = _mk(spark, [
        (0, 1, "I", "r1", "a.py", "c1", "py", "v1"),
        (0, 2, "I", "r1", "b.py", "c2", "ts", "v2"),
        (0, 3, "X", "r1", "c.py", "c3", "go", "v3"),   # unsupported op
        (0, 4, "I", "r1", None, "c4", "py", "v4"),     # null key
    ])
    process_epoch(spark, sink, e0, 0, cfg)
    return sink, cfg


def test_requeue_repairs_and_marks_consumed(spark, tmp_path):
    sink, cfg = _setup(spark, tmp_path)
    assert dead_letter_epochs(sink.table_path) == [0]
    dead = read_dead_letters(spark, sink.table_path).toPandas()
    assert len(dead) == 2 and set(dead["_src_epoch"]) == {0}

    # upstream fix: 'X' was a renamed insert; the null path is recoverable
    def repair(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "X", F.lit("I")).otherwise(F.col("op"))
        ).withColumn("path", F.coalesce(F.col("path"), F.lit("d.py")))

    r = requeue_dead_letters(spark, sink, cfg, repair=repair)
    assert r["requeued_epochs"] == [0] and r["requeue_epoch"] == 1
    out = sink.load().orderBy("path").toPandas()
    assert list(out["path"]) == ["a.py", "b.py", "c.py", "d.py"]
    # channel consumed: marker written, enumeration empty, second call no-op
    assert dead_letter_epochs(sink.table_path) == []
    assert os.path.exists(
        os.path.join(sink.table_path, "_dead_letter", "epoch=0", "_REQUEUED")
    )
    assert requeue_dead_letters(spark, sink, cfg).get("skipped")


def test_still_invalid_rows_reenter_the_channel(spark, tmp_path):
    sink, cfg = _setup(spark, tmp_path)

    def half_repair(df):  # fixes the op, leaves the null key broken
        return df.withColumn(
            "op", F.when(F.col("op") == "X", F.lit("I")).otherwise(F.col("op"))
        )

    r = requeue_dead_letters(spark, sink, cfg, repair=half_repair)
    assert sink.load().count() == 3  # a,b + repaired c
    # the null-key row is dead again, now under the requeue epoch
    assert dead_letter_epochs(sink.table_path) == [r["requeue_epoch"]]
    dead = read_dead_letters(spark, sink.table_path).toPandas()
    assert len(dead) == 1 and dead["error"][0] == "missing required field: path"


def test_requeued_stale_ordinal_loses_lww(spark, tmp_path):
    """While a row sat in the channel, a newer event for the same key
    committed.  The requeued row keeps its ORIGINAL ordinal and must lose
    the merge's ordinal guard — requeue never resurrects stale state."""
    sink, cfg = _setup(spark, tmp_path)
    # epoch 1: c.py lands properly with a HIGHER ordinal than the dead row
    process_epoch(
        spark, sink, _mk(spark, [(1, 9, "I", "r1", "c.py", "c9", "go", "v9")]), 1, cfg
    )

    def repair(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "X", F.lit("I")).otherwise(F.col("op"))
        ).withColumn("path", F.coalesce(F.col("path"), F.lit("d.py")))

    requeue_dead_letters(spark, sink, cfg, repair=repair)
    row = sink.load().where(F.col("path") == "c.py").first()
    assert row["commit"] == "c9" and row["ordinal"] == 9  # ordinal 3 lost
    assert sink.load().where(F.col("path") == "d.py").count() == 1  # new key won


def test_src_epoch_labels_survive_missing_dirs(spark, tmp_path):
    """Requesting epochs whose dirs don't all exist must not shift the
    _src_epoch labels of the ones that do (regression: a post-filter zip
    tagged epoch 3's rows with epoch 1)."""
    sink, cfg = _setup(spark, tmp_path)  # dead letters live at epoch=0
    dead = read_dead_letters(spark, sink.table_path, epochs=[-5, 0]).toPandas()
    assert set(dead["_src_epoch"]) == {0}
    assert len(dead) == 2


def test_check_constraints_route_false_rows_only(spark, tmp_path):
    """Declarative CHECK at the ingest gate: rows where the predicate is
    FALSE dead-letter under the constraint's name; NULL passes (SQL CHECK
    three-valued logic), TRUE passes."""
    path = str(tmp_path / "ck")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    cfg = ReplayConfig(
        validate=True,
        check_constraints={
            "lang_known": "lang IN ('py', 'ts', 'go')",
            "content_nonempty": "length(content) > 0",
        },
    )
    e0 = _mk(spark, [
        (0, 1, "I", "r1", "a.py", "c1", "py", "v1"),    # passes both
        (0, 2, "I", "r1", "b.py", "c2", "rb", "v2"),    # lang_known FALSE
        (0, 3, "I", "r1", "c.py", "c3", None, "v3"),    # lang NULL → passes
        (0, 4, "I", "r1", "d.py", "c4", "py", ""),      # content_nonempty FALSE
    ])
    process_epoch(spark, sink, e0, 0, cfg)
    live = {r["path"] for r in sink.load().collect()}
    assert live == {"a.py", "c.py"}
    dead = read_dead_letters(spark, sink.table_path).toPandas()
    errs = dict(zip(dead["path"], dead["error"]))
    assert errs == {
        "b.py": "check constraint violated: lang_known",
        "d.py": "check constraint violated: content_nonempty",
    }

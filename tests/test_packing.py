"""Sequence packing (operators/packing.py): boundary semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.packing import pack_sequences


def test_pack_boundary_and_overflow(spark):
    # one shard; budget 10: docs of 4,4,4 -> third doc STARTS at offset 8
    # inside seq 0 (concatenation semantics), fourth (12 tokens, longer
    # than the budget) starts at 12 -> seq 1, fifth starts at 24 -> seq 2
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 12), (5, 3)], "doc_id long, n long"
    )
    out = pack_sequences(df, "n", "doc_id", shard=F.lit(0), max_tokens=10)
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out.collect()}
    assert got == {1: (0, 0), 2: (0, 4), 3: (0, 8), 4: (1, 2), 5: (2, 4)}


def test_pack_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(0, 6), (1, 6), (2, 6), (3, 6)], "doc_id long, n long"
    )
    out = pack_sequences(
        df, "n", "doc_id", shard=F.pmod(F.col("doc_id"), F.lit(2)), max_tokens=10
    )
    got = {r["doc_id"]: (r["shard"], r["seq_id"], r["seq_offset"]) for r in out.collect()}
    # shard 0: docs 0,2 -> starts 0,6; shard 1: docs 1,3 -> starts 0,6
    assert got == {0: (0, 0, 0), 2: (0, 0, 6), 1: (1, 0, 0), 3: (1, 0, 6)}

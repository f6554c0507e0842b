"""Training-sequence packing — assign documents to fixed-token-budget
training sequences by contiguous concatenation, the standard pretraining
data layout (documents concatenated in a deterministic order, the token
stream cut every ``max_tokens``; each document belongs to the sequence
its FIRST token lands in).

Expressed as pure window arithmetic: per shard, running token prefix-sum
in the pack order, then ``seq_id = (prefix_sum - tokens) div max_tokens``
— a document's start offset decides its sequence.  One shuffle (the
shard window), everything else is codegen'd arithmetic; deterministic, so
the DuckDB oracle reproduces it exactly.

Scale note: a window needs a partition key — packing one GLOBAL stream
would funnel 100 TB through a single task.  Real pipelines shard first
(per input file / bucket / hash of doc id) and pack within shards, which
is exactly what training wants anyway (shards = independent data-loader
streams).  ``pack_sequences`` therefore REQUIRES a shard expression; a
caller who truly wants one stream passes a constant and owns the
single-partition consequence.

Documents longer than ``max_tokens`` still get assigned to the sequence
their first token lands in (they then span following sequences — the
concatenation semantics); filter them upstream if the consumer needs
every document to fit inside one sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    shard: Column,
    max_tokens: int,
) -> DataFrame:
    """Adds ``shard``, ``seq_id`` (0-based per shard), ``seq_offset``
    (token offset of the document's first token inside its sequence)
    to ``df``.  ``order_col`` fixes the concatenation order inside each
    shard — it must be unique per shard or the packing is ambiguous."""
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    return (
        out.withColumn("_start", start)
        .withColumn("seq_id", F.expr(f"_start div {int(max_tokens)}"))
        .withColumn("seq_offset", F.expr(f"_start % {int(max_tokens)}"))
        .drop("_start")
    )

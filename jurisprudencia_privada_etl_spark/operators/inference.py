"""Pluggable model-inference stage with content-hash caching.

The reference runs an expensive NLP conversion per document and caches the
result keyed by content hash, recomputing only on miss (convertAndSaveNLP,
sharepoint.ts:695-720; cache load at sharepoint.ts:269-283).  The network
inference call itself is out of scope here (SURVEY.md scopes network I/O
out), so the stage is a SEAM: any callable over a pandas batch plugs in —
an in-process model, a Triton/HTTP client, a tokenizer — and the engine
guarantees it runs Arrow-batched on executors and ONLY over cache misses.

Scale shape: the cache join is `reuse_cached` (uniform sha256 key — skew-
free; AQE picks broadcast vs shuffle from the cache's real size), and the
model runs inside ``mapInPandas`` so one Python worker per core streams
batches — never a per-row UDF, never a driver-side loop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jurisprudencia_privada_etl_spark.operators.reuse import reuse_cached

# A model takes one pandas batch and returns it with the output columns
# added (extra columns are ignored; input columns must be preserved).
InferenceFn = Callable[[pd.DataFrame], pd.DataFrame]


def _parse(dtype: str) -> T.DataType:
    return T._parse_datatype_string(dtype)


def deterministic_fake_model(out_fields: list[tuple[str, str]], content_col: str = "content") -> InferenceFn:
    """Test/bench stand-in: each output column is a deterministic function
    of the content (length-based), so re-runs are reproducible and a cached
    value is distinguishable from a fresh one only by provenance."""

    def model(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        for name, dtype in out_fields:
            if dtype in ("int", "bigint", "long"):
                out[name] = pdf[content_col].map(lambda c: len(c or ""))
            else:
                out[name] = pdf[content_col].map(lambda c: f"fresh:{len(c or '')}")
        return out

    return model


def apply_inference(
    df: DataFrame,
    model: InferenceFn,
    out_fields: list[tuple[str, str]],
    max_batch_rows: int | None = None,
) -> DataFrame:
    """Run ``model`` over ``df`` in Arrow batches, appending ``out_fields``.

    ``max_batch_rows`` re-chunks the incoming Arrow batches before the model
    call — serving endpoints usually cap request size; Spark's own
    maxRecordsPerBatch caps the transfer, this caps the CALL."""
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(n, _parse(t), True) for n, t in out_fields]
    )
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if max_batch_rows and len(pdf) > max_batch_rows:
                for start in range(0, len(pdf), max_batch_rows):
                    yield model(pdf.iloc[start : start + max_batch_rows])[names]
            else:
                yield model(pdf)[names]

    return df.mapInPandas(run, schema=schema)


def infer_with_cache(
    batch: DataFrame,
    cache: DataFrame | None,
    model: InferenceFn,
    out_fields: list[tuple[str, str]],
    content_col: str = "content",
    key_col: str = "content_sha",
    max_batch_rows: int | None = None,
) -> DataFrame:
    """The full stage: key by sha2(content), reuse cached outputs, run the
    model ONLY over misses, return hits ∪ fresh rows.

    ``cache`` holds (key_col, *out_cols) from prior runs (None → cold).  The
    returned frame carries every input column plus out_fields and key_col;
    feed it to ``cache_entries`` to persist the updated cache."""
    out_cols = [n for n, _ in out_fields]
    b = batch
    if key_col not in b.columns:
        b = b.withColumn(key_col, F.sha2(F.col(content_col).cast("string"), 256))
    if cache is None:
        spark = batch.sparkSession
        cache = spark.createDataFrame(
            [],
            T.StructType(
                [T.StructField(key_col, T.StringType(), True)]
                + [T.StructField(n, _parse(t), True) for n, t in out_fields]
            ),
        )
    return reuse_cached(
        b,
        cache,
        [key_col],
        out_cols,
        lambda misses: apply_inference(misses, model, out_fields, max_batch_rows),
    )


def cache_entries(result: DataFrame, out_fields: list[tuple[str, str]], key_col: str = "content_sha") -> DataFrame:
    """Distill a result frame into rows for the persisted inference cache."""
    return result.select(key_col, *[n for n, _ in out_fields]).dropDuplicates([key_col])

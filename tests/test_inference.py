"""Inference-stage seam: cache hits skip the model, misses flow through it
(the convertAndSaveNLP analog — reference sharepoint.ts:695-720)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.inference import (
    apply_inference,
    cache_entries,
    deterministic_fake_model,
    infer_with_cache,
)

OUT = [("summary", "string"), ("n_chars", "bigint")]


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_cache_hits_skip_model_and_misses_run_it(spark):
    batch = spark.createDataFrame(
        [("a.py", "aaaa"), ("b.py", "bb"), ("c.py", "cccccc")], ["path", "content"]
    )
    # warm cache holds b.py's content keyed by sha — with a value the fake
    # model could never produce, so provenance is observable
    cache = spark.createDataFrame(
        [(_sha("bb"), "cached:2", 2)], ["content_sha", "summary", "n_chars"]
    )
    out = infer_with_cache(batch, cache, deterministic_fake_model(OUT), OUT)
    rows = {r["path"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["b.py"]["summary"] == "cached:2"  # hit: cached value survives
    assert rows["a.py"]["summary"] == "fresh:4"  # misses: model output
    assert rows["c.py"]["summary"] == "fresh:6"
    assert rows["a.py"]["n_chars"] == 4 and rows["b.py"]["n_chars"] == 2

    # the updated cache covers all three contents exactly once
    cache2 = cache_entries(out, OUT)
    assert cache2.count() == 3
    # second pass over the same batch with the refreshed cache: NOTHING runs
    # through the model — a poisoned model proves it
    def poisoned(pdf):
        raise AssertionError("model must not run on a fully-warm cache")

    out2 = infer_with_cache(batch, cache2, poisoned, OUT)
    assert {r["summary"] for r in out2.collect()} == {"cached:2", "fresh:4", "fresh:6"}


def test_cold_cache_runs_model_for_every_row(spark):
    batch = spark.createDataFrame([("x", "q" * 7)], ["path", "content"])
    out = infer_with_cache(batch, None, deterministic_fake_model(OUT), OUT)
    r = out.collect()[0]
    assert r["summary"] == "fresh:7" and r["content_sha"] == _sha("q" * 7)


def test_apply_inference_respects_call_batch_cap(spark):
    def sizing_model(pdf):
        # executed on workers; sizes come back via the output column
        out = pdf.copy()
        out["summary"] = f"batch:{len(pdf)}"
        out["n_chars"] = len(pdf)
        return out

    df = spark.range(100).select(
        F.col("id").cast("string").alias("path"), F.lit("zz").alias("content")
    ).coalesce(1)
    out = apply_inference(df, sizing_model, OUT, max_batch_rows=16)
    sizes = [r["n_chars"] for r in out.collect()]
    assert max(sizes) <= 16 and sum(set(sizes)) >= 16  # re-chunked, none above cap
    assert len(sizes) == 100

"""functions/sampling.py — deterministic hash sampling / splitting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.functions.sampling import (
    deterministic_sample,
    hash_hex,
    hash_split,
    hex_threshold,
)

SF = "/root/testdata/sf0.001"


def test_hex_threshold_endpoints_and_order():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "ffffffff"
    ts = [hex_threshold(f) for f in (0.1, 0.2, 0.5, 0.8, 0.9)]
    assert ts == sorted(ts)  # lexicographic == numeric for lowercase hex


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        hex_threshold(1.5)
    with pytest.raises(ValueError):
        hash_split("k", {"a": 0.5, "b": 0.3})  # doesn't sum to 1


def test_split_partitions_every_row_and_is_stable(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    split = hash_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s")
    counts = {
        r["split"]: r["n"]
        for r in d.select(split.alias("split")).groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sum(counts.values()) == d.count()
    # ~80/10/10 within generous tolerance at 100 docs
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # stable under repartitioning (row-local, no RNG)
    again = {
        r["split"]: r["n"]
        for r in d.repartition(7).select(split.alias("split")).groupBy("split")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert again == counts


def test_sample_rate_and_join_consistency(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s = deterministic_sample(d, "doc_id", 0.3, salt="j")
    n, k = d.count(), s.count()
    assert 0 < k < n
    # sampling a second "table" on the same key keeps the same keys:
    other = d.select("doc_id", F.lit(1).alias("x"))
    s2 = deterministic_sample(other, "doc_id", 0.3, salt="j")
    left = {r["doc_id"] for r in s.select("doc_id").collect()}
    right = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert left == right


def test_salt_decorrelates(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5, "a").select("doc_id").collect()}
    b = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5, "b").select("doc_id").collect()}
    assert a != b  # same rate, different draw


def test_sample_filter_is_row_local_scan_filter(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        deterministic_sample(d, "doc_id", 0.2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: pure scan + filter
    assert "BatchEvalPython" not in plan


def test_hash_hex_matches_python_md5(spark):
    import hashlib

    rows = (
        spark.range(5)
        .select(F.col("id"), hash_hex("id", salt="z").alias("h"))
        .collect()
    )
    for r in rows:
        assert r["h"] == hashlib.md5(f"z{r['id']}".encode()).hexdigest()[:8]

"""Physical-plan assertions (SURVEY.md §4): the optimizations the engine
relies on at 100 TB must actually appear in the executed plans —
partition pruning on the epoch scan, column pruning on the stats pass,
broadcast strategy for small dims, and no Python in JVM-only stages."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jurisprudencia_privada_etl_spark.operators.lww import lww_dedup_agg
from jurisprudencia_privada_etl_spark.sources.changelog import read_epoch, write_changelog
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def stored_changelog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clog") / "changelog")
    write_changelog(synthetic_changelog(spark, 2000, n_epochs=4, num_partitions=4), path)
    return path


def test_epoch_scan_partition_pruning(spark, stored_changelog):
    """WHERE epoch = E must prune to one partition directory (P1)."""
    df = read_epoch(spark, stored_changelog, 2)
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "epoch" in plan.split("PartitionFilters")[1][:200]
    # pruned scan reads only epoch=2 rows without a post-scan filter job
    assert df.count() == spark.read.parquet(stored_changelog).where("epoch = 2").count()


def test_key_stats_column_pruning(spark, stored_changelog):
    """The raw-batch stats pass must scan only the columns it needs —
    a scan reading all 8 changelog columns for a 3-column aggregation is
    wrong (SURVEY.md 'Push down and prune')."""
    batch = read_epoch(spark, stored_changelog, 0)
    stats = batch.groupBy(
        F.spark_partition_id().alias("p"),
        F.pmod(F.xxhash64("repo", "path"), F.lit(64)).alias("b"),
    ).agg(F.count("*").alias("n"), F.sum(F.octet_length("content")).alias("bytes"))
    plan = plan_of(stats)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "repo" in read_schema and "content" in read_schema
    for unused in ("commit", "lang", "op", "ordinal"):
        assert unused not in read_schema, f"{unused} should be pruned from the scan"


def test_small_dim_join_is_broadcast(spark):
    facts = spark.range(10000).select(
        F.col("id"), F.pmod(F.col("id"), F.lit(25)).cast("int").alias("k")
    )
    dim = spark.createDataFrame([(i, f"name{i}") for i in range(25)], ["k", "name"])
    plan = plan_of(facts.join(F.broadcast(dim), "k"))
    assert "BroadcastHashJoin" in plan


def test_lww_agg_has_partial_aggregation(spark, stored_changelog):
    """max_by LWW must show a two-phase hash aggregate (partial_ map-side
    combine before the exchange) — the hot-key pre-reduction at scale."""
    batch = read_epoch(spark, stored_changelog, 0)
    plan = plan_of(lww_dedup_agg(batch))
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower()


def test_jvm_derived_stage_has_no_python(spark, stored_changelog):
    """with_jvm_derived must stay in whole-stage codegen: no Arrow/Python
    eval nodes in its plan."""
    from jurisprudencia_privada_etl_spark.extraction import with_jvm_derived

    plan = plan_of(with_jvm_derived(read_epoch(spark, stored_changelog, 0)))
    # (the AQE wrapper hides WholeStageCodegen markers in toString; the
    # load-bearing assertion is the absence of any Python eval node)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_extraction_python_is_arrow_vectorized(spark, stored_changelog):
    """The NFD fold must run as ArrowEvalPython (vectorized pandas UDF),
    never row-at-a-time BatchEvalPython (north rule: no per-row Python)."""
    from jurisprudencia_privada_etl_spark.extraction import extraction_stage

    plan = plan_of(extraction_stage(read_epoch(spark, stored_changelog, 0)))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan

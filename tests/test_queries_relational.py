"""Relational-completeness query family (queries_relational.py).

The DuckDB oracle pairing is the cross-engine gate; these tests pin the
*internal* invariants each query claims, at sf0.001, plus the plan
properties that make them scale-safe.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.queries import QUERIES, derived_changelog

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return QUERIES[name](spark, SF)


def test_interval_range_join_matches_naive_theta_join(spark):
    """The bucketed equi-join must produce exactly the naive
    BETWEEN-join's pairs (bucket explosion is an optimization, never a
    semantics change)."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    signups = e.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("signup_id"),
    )
    naive = (
        clicks.join(
            signups,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("ts") >= F.col("s_ts"))
            & (F.col("ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOURS")),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("click_id").alias("n_clicks"),
            F.countDistinct("signup_id").alias("n_signups"),
        )
    )
    got = {r["user_id"]: r.asDict() for r in _q(spark, "interval_range_join").collect()}
    want = {r["user_id"]: r.asDict() for r in naive.collect()}
    assert got == want
    assert len(got) > 0


def test_interval_range_join_plan_has_no_nested_loop(spark):
    plan = _q(spark, "interval_range_join")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pivot_counts_rows_sum_to_daily_totals(spark):
    piv = _q(spark, "pivot_counts").collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    totals = {
        r["day"]: r["n"]
        for r in e.groupBy(F.dayofmonth("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(piv) == len(totals)
    for r in piv:
        row_sum = r["n_click"] + r["n_error"] + r["n_purchase"] + r["n_signup"] + r["n_view"]
        assert row_sum == totals[r["day"]]


def test_grouping_sets_levels_and_grand_total(spark):
    rows = _q(spark, "grouping_sets_counts").collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["n_orders"] == n_orders
    # per-status subtotals (gid=1) fold their detail rows (gid=0)
    detail = {}
    for r in rows:
        if r["gid"] == 0:
            detail.setdefault(r["o_orderstatus"], 0)
            detail[r["o_orderstatus"]] += r["n_orders"]
    for r in rows:
        if r["gid"] == 1:
            assert detail[r["o_orderstatus"]] == r["n_orders"]


def test_histogram_bins_partition_the_table(spark):
    rows = _q(spark, "histogram_bins").collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n"] for r in rows) == li.count()
    assert all(r["n"] > 0 for r in rows)
    assert len({r["bin"] for r in rows}) == len(rows)


def test_set_ops_cohorts_are_consistent(spark):
    rows = _q(spark, "set_ops_users").collect()
    by = {}
    for r in rows:
        by.setdefault(r["cohort"], set()).add(r["user_id"])
    # cohorts can be legitimately empty at tiny sf (every clicker purchased)
    both = by.get("both", set())
    click_only = by.get("click_only", set())
    either = by.get("either", set())
    assert both.isdisjoint(click_only)
    assert (both | click_only) <= either
    e = spark.read.parquet(f"{SF}/events.parquet")
    clickers = {r["user_id"] for r in e.where("event_type = 'click'").select("user_id").distinct().collect()}
    buyers = {r["user_id"] for r in e.where("event_type = 'purchase'").select("user_id").distinct().collect()}
    assert both == clickers & buyers
    assert click_only == clickers - buyers
    assert either == clickers | buyers


def test_salted_agg_equals_unsalted(spark):
    got = {r["repo"]: r.asDict() for r in _q(spark, "salted_hot_key_agg").collect()}
    plain = {
        r["repo"]: r.asDict()
        for r in derived_changelog(spark, SF)
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("ordinal").alias("sum_ordinal"),
            F.max("ordinal").alias("max_ordinal"),
            F.countDistinct("path").alias("n_paths"),
        )
        .collect()
    }
    assert got == plain


def test_percentile_disc_monotone_and_from_source(spark):
    rows = _q(spark, "percentile_disc").collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["p"]] = r["pct_value"]
    src = {
        t: {x["value"] for x in e.where(F.col("event_type") == t).select("value").collect()}
        for t in by_type
    }
    for t, ps in by_type.items():
        assert set(ps) == {0.5, 0.9, 0.99}
        assert ps[0.5] <= ps[0.9] <= ps[0.99]
        for v in ps.values():
            assert v in src[t]  # rank selection, never interpolation


def test_dup_tolerant_replay_equals_exactly_once_state(spark):
    dup = {(r["repo"], r["path"]): (r["ordinal"], r["content_sha"])
           for r in _q(spark, "dup_tolerant_replay").collect()}
    once = {(r["repo"], r["path"]): (r["ordinal"], r["content_sha"])
            for r in _q(spark, "cdc_lww_replay").collect()}
    assert dup == once


def test_chunk_documents_count_formula_and_bounds(spark):
    rows = _q(spark, "chunk_documents").collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    lens = {r["doc_id"]: r["n"] for r in d.select("doc_id", F.length("text").alias("n")).collect()}
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
        assert 1 <= r["chunk_len"] <= 400
    for doc_id, n in lens.items():
        expect = 1 + (max(n - 1, 0)) // 300 if n >= 1 else 1
        assert len(per_doc[doc_id]) == expect
        idxs = sorted(r["chunk_idx"] for r in per_doc[doc_id])
        assert idxs == list(range(expect))
        # every chunk except possibly the last is full-size when the doc
        # extends past its window
        for r in per_doc[doc_id]:
            start = r["chunk_idx"] * 300
            assert r["chunk_len"] == min(400, n - start)


def test_chunk_documents_is_pure_jvm(spark):
    plan = _q(spark, "chunk_documents")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

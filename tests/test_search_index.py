"""Incrementally-maintained inverted index (operators/search_index.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.change_feed import change_feed, diff_states
from jurisprudencia_privada_etl_spark.operators.search_index import (
    apply_feed,
    build_index,
    index_columns,
    search,
)
from jurisprudencia_privada_etl_spark.plans.replay import replay_dataframe
from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog


def _cmp(a, b, cols):
    pa = a.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    pb = b.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb, check_dtype=False)


def test_incremental_index_equals_rebuild_through_real_sink(spark, tmp_path):
    """Index built at epoch 1, advanced by the sink's preimage change feed
    over two more epochs of inserts/updates/deletes — posting-for-posting
    equal to a from-scratch build of the final state."""
    log = synthetic_changelog(
        spark, 2500, seed=47, n_epochs=4, n_repos=6, paths_per_repo=50,
        pct_update=0.4, pct_delete=0.15,
    )
    sink = replay_dataframe(spark, log.where(F.col("epoch") <= 1), str(tmp_path / "t"))
    v0 = sink.manifest().version
    index = build_index(sink.load().drop(BUCKET_COLUMN))
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    feed = change_feed(sink, v0, delete_image="preimage")
    got = apply_feed(index, feed)
    want = build_index(sink.load().drop(BUCKET_COLUMN))
    _cmp(got, want, index_columns())


def test_update_retires_old_postings_and_adds_new(spark):
    """An update whose new text drops a word removes that posting entirely
    (no zero-tf husk) and decrements shared words correctly."""
    old = spark.createDataFrame(
        [("r", "a", "hello hello world")], "repo string, path string, content string"
    )
    new = spark.createDataFrame(
        [("r", "a", "hello mars")], "repo string, path string, content string"
    )
    idx = apply_feed(build_index(old), diff_states(old, new, ["repo", "path"]))
    got = {(r["term"]): r["tf"] for r in idx.collect()}
    assert got == {"hello": 1, "mars": 1}, got


def test_search_and_semantics_with_deterministic_tiebreak(spark):
    docs = [
        ("r", "a", "spark shuffle join"),
        ("r", "b", "spark spark shuffle"),
        ("r", "c", "shuffle only here"),
        ("r", "d", "spark shuffle spark shuffle"),
    ]
    idx = build_index(spark.createDataFrame(docs, "repo string, path string, content string"))
    rows = [tuple(r) for r in search(idx, ["spark", "shuffle"], k=3).collect()]
    # AND drops doc c; scores: d=4, b=3, a=2; ties impossible here but the
    # ordering is (score desc, repo, path) by contract
    assert rows == [("r", "d", 4), ("r", "b", 3), ("r", "a", 2)], rows


def test_index_build_is_jvm_side(spark):
    """The token explode + groupBy must stay in the JVM (Generate node, no
    BatchEvalPython) — tokenization at 100 TB cannot round-trip Python."""
    df = spark.createDataFrame(
        [("r", "a", "alpha beta")], "repo string, path string, content string"
    )
    plan = build_index(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Generate" in plan


def test_search_over_stored_index_pushes_term_filter_to_scan(spark, tmp_path):
    """An index persisted as parquet is the deployment shape; search()'s
    `term IN (...)` must reach the scan as a pushed filter so the read is
    O(matching postings), not O(index) (SURVEY.md 'Push down and prune')."""
    docs = [("r", f"p{i}", f"word{i} shared tail{i % 3}") for i in range(50)]
    idx = build_index(spark.createDataFrame(docs, "repo string, path string, content string"))
    path = str(tmp_path / "index")
    idx.write.parquet(path)
    stored = spark.read.parquet(path)
    plan = (
        search(stored, ["shared", "word7"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan = plan[plan.index("FileScan"):].splitlines()[0]
    assert "PushedFilters" in scan and "In(term" in scan, scan

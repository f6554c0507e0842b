"""operators/zorder.py — Morton clustering and the file-skipping it buys."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.zorder import Z_COLUMN, cluster_by, zvalue

SF = "/root/testdata/sf0.001"


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def _files_matching(path: str, col: str, value) -> tuple[int, int]:
    """(files whose min/max admit value, total files) from parquet stats —
    exactly the decision a stats-pruning scan makes per file."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    n_match = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None and lo <= value <= hi:
            n_match += 1
    return n_match, len(files)


@pytest.fixture(scope="module")
def layouts(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    base = tempfile.mkdtemp(prefix="zorder_")
    single = os.path.join(base, "single_sorted")
    zord = os.path.join(base, "zordered")
    _write(
        li.repartitionByRange(8, "l_partkey").sortWithinPartitions("l_partkey"),
        single,
    )
    _write(cluster_by(li, ["l_partkey", "l_suppkey"], bits=8, num_partitions=8), zord)
    return li, single, zord


def test_zorder_preserves_data_exactly(spark, layouts):
    li, _, zord = layouts
    back = spark.read.parquet(zord)
    assert back.count() == li.count()
    cols = li.columns
    # bit_xor folds are order-insensitive and cannot overflow in ANSI mode
    a = li.agg(*[F.expr(f"bit_xor(xxhash64({c}))").alias(c) for c in cols]).collect()[0]
    b = back.agg(*[F.expr(f"bit_xor(xxhash64({c}))").alias(c) for c in cols]).collect()[0]
    assert a == b
    assert Z_COLUMN not in back.columns


def test_zorder_skips_files_on_second_dimension(spark, layouts):
    """The whole point: a predicate on the NON-leading dimension prunes
    z-ordered files but reads every single-sorted file."""
    li, single, zord = layouts
    probe = li.select(F.min("l_suppkey")).collect()[0][0]
    m_single, n_single = _files_matching(single, "l_suppkey", probe)
    m_zord, n_zord = _files_matching(zord, "l_suppkey", probe)
    assert n_single == n_zord == 8
    assert m_single == n_single  # single-dim sort: no pruning on dim 2
    assert m_zord <= n_zord // 2  # z-order: at least half the files skip


def test_zorder_still_prunes_leading_dimension(spark, layouts):
    li, _, zord = layouts
    probe = li.select(F.min("l_partkey")).collect()[0][0]
    m, n = _files_matching(zord, "l_partkey", probe)
    assert m < n  # still skips some files on dim 1 too


def test_string_dimension_clusters(spark):
    """String dims rank by order-preserving byte prefix — files get tight
    string min/max ranges as well."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    path = tempfile.mkdtemp(prefix="zorder_str_")
    _write(cluster_by(d, ["lang", "doc_id"], bits=4, num_partitions=4), path)
    # probe the max lang: its prefix rank is far from the others', so some
    # z-ranges must exclude it entirely
    m, n = _files_matching(path, "lang", d.select(F.max("lang")).collect()[0][0])
    assert n == 4 and m < n


def test_cluster_by_is_one_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = (
        cluster_by(li, ["l_partkey", "l_suppkey"], num_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()


def test_zvalue_validation(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    with pytest.raises(ValueError):
        zvalue(li, [])
    with pytest.raises(ValueError):
        zvalue(li, ["l_partkey"], bits=40)
    with pytest.raises(ValueError):
        zvalue(li, ["no_such_col"])


def test_constant_dimension_is_harmless(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn("k", F.lit(5))
    out = cluster_by(li, ["k", "l_partkey"], bits=4, num_partitions=2)
    assert out.count() == li.count()


def test_compact_zorder_preserves_state_and_tightens_stats(spark, tmp_path):
    """compact(zorder=[...]) is OPTIMIZE ZORDER: same rows, same epoch,
    but per-file column ranges tighten so stats-pruning skips files."""
    from tests.conftest import assert_state_equal, oracle_reduce
    from jurisprudencia_privada_etl_spark.plans.replay import (
        ReplayConfig,
        replay_dataframe,
    )
    from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

    log = synthetic_changelog(
        spark, 2000, seed=13, n_epochs=2, n_repos=8, paths_per_repo=60,
        pct_update=0.4, pct_delete=0.15,
    )
    pdf = log.toPandas()
    cfg = ReplayConfig(n_buckets=4, files_per_bucket=4)
    plain = replay_dataframe(spark, log, str(tmp_path / "plain"), cfg)
    zsink = replay_dataframe(spark, log, str(tmp_path / "zord"), cfg)
    plain.compact(target_files_per_bucket=2, min_files=1)
    epoch_before = zsink.last_committed_epoch()
    res = zsink.compact(target_files_per_bucket=2, min_files=1, zorder=["lang", "repo"])
    assert res["compacted_buckets"] > 0
    assert zsink.last_committed_epoch() == epoch_before

    expected = oracle_reduce(pdf)
    state = zsink.load().select(
        "repo", "path", "commit", "lang", "content", "ordinal", "content_sha"
    ).toPandas()
    assert_state_equal(state, expected)

    # file-stat pruning: with files_per_bucket=2 the z sub-split cuts on
    # the top Morton bit, which belongs to the LAST dimension (repo) —
    # probe the max repo and count admitting files under each layout
    probe = max(pdf["repo"])

    def admitting(sink):
        m = sink.manifest()
        match = total = 0
        for entry in m.buckets.values():
            d = os.path.join(sink.table_path, entry["path"])
            for f in glob.glob(os.path.join(d, "*.parquet")):
                md = pq.ParquetFile(f).metadata
                lo = hi = None
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for i in range(g.num_columns):
                        c = g.column(i)
                        if c.path_in_schema == "repo" and c.statistics is not None:
                            s = c.statistics
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
                total += 1
                if lo is not None and lo <= probe <= hi:
                    match += 1
        return match, total

    m_plain, n_plain = admitting(plain)
    m_z, n_z = admitting(zsink)
    assert n_plain > 4 and n_z > 4  # sub-split survived compaction
    assert m_z < m_plain  # z-layout skips files the hash layout cannot


def test_zvalue_rejects_morton_overflow(spark):
    """bits*ndims > 63 would push the top Morton bit into the long's sign
    bit (negative z → range partitioner misorders); must raise up front."""
    import pytest
    from jurisprudencia_privada_etl_spark.operators.zorder import zvalue

    df = spark.range(4).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(ValueError, match="exceeds 63"):
        zvalue(df, ["a", "b", "c", "d"], bits=16)

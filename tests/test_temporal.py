"""Unit tests for operators/temporal.py and operators/sketches.py — the
paths the driver oracles don't exercise: tolerance, inner-vs-left, tie
determinism under shuffle, interval_join's left mode and bucket-width
invariance, sketch materialization + mergeability, and the single-shuffle
plan shape of the as-of join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.sketches import (
    POLY_DOMAIN,
    kmv_distinct,
    kmv_hash_poly,
    kmv_hash_sha2,
    kmv_sketch,
    kmv_union_estimate,
)
from jurisprudencia_privada_etl_spark.operators.temporal import (
    asof_join,
    interval_join,
    scd2_build,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    # key, ts, px — includes a (k, ts) tie at 10:00 to pin tie-break
    rows = [
        ("a", _ts("2024-01-01T09:00:00"), 1.0, 1),
        ("a", _ts("2024-01-01T10:00:00"), 2.0, 2),
        ("a", _ts("2024-01-01T10:00:00"), 3.0, 3),  # tie: higher seq wins
        ("a", _ts("2024-01-01T12:00:00"), 4.0, 4),
        ("b", _ts("2024-01-01T11:00:00"), 9.0, 5),
    ]
    return spark.createDataFrame(rows, "k string, qts timestamp, px double, seq int")


@pytest.fixture()
def trades(spark):
    rows = [
        ("a", _ts("2024-01-01T08:59:00"), 100),  # before any quote -> null
        ("a", _ts("2024-01-01T10:00:00"), 101),  # exact tie ts -> inclusive, seq=3 wins
        ("a", _ts("2024-01-01T11:30:00"), 102),  # between -> 10:00 quote
        ("a", _ts("2024-01-01T23:00:00"), 103),  # far after -> 12:00 quote
        ("b", _ts("2024-01-01T11:00:30"), 104),
        ("c", _ts("2024-01-01T11:00:00"), 105),  # key with no quotes at all
    ]
    return spark.createDataFrame(rows, "k string, tts timestamp, trade_id int")


def test_asof_backward_inclusive_with_ties(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts",
        right_cols=["px", "seq"], tie_break="seq",
    )
    got = {r["trade_id"]: (r["px"], r["seq"]) for r in out.collect()}
    assert got[100] == (None, None)
    assert got[101] == (3.0, 3)  # inclusive + max tie_break at equal ts
    assert got[102] == (3.0, 3)
    assert got[103] == (4.0, 4)
    assert got[104] == (9.0, 5)
    assert got[105] == (None, None)
    assert out.count() == trades.count()  # left join keeps everything


def test_asof_inner_and_tolerance(spark, quotes, trades):
    inner = asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="seq", how="inner",
    )
    assert sorted(r["trade_id"] for r in inner.collect()) == [101, 102, 103, 104]
    # 1-hour tolerance: 103 (11h stale) and 102 (90min stale) lose their
    # matches; 101 (exact) and 104 (30s) keep theirs
    tol = asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="seq",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    got = {r["trade_id"]: r["px"] for r in tol.collect()}
    assert got[103] is None and got[102] is None
    assert got[101] == 3.0 and got[104] == 9.0


def test_asof_join_is_single_shuffle(spark, quotes, trades):
    """The union+window plan must shuffle exactly once (on the key) — no
    join node, no second exchange.  This is the operator's whole scale
    argument vs a theta join."""
    out = asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="seq",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_asof_right_nulls_do_not_mix_rows(spark):
    """Right attributes travel as one struct: a null attribute in the
    nearest right row must NOT be backfilled from an older right row."""
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01T09:00:00"), 1.0, "old"),
         ("k", _ts("2024-01-01T10:00:00"), None, "new")],
        "k string, qts timestamp, px double, tag string",
    )
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01T11:00:00"), 1)], "k string, tts timestamp, i int"
    )
    row = asof_join(
        left, right, on="k", left_ts="tts", right_ts="qts", right_cols=["px", "tag"]
    ).collect()[0]
    assert row["tag"] == "new" and row["px"] is None


def test_scd2_intervals_are_contiguous(spark, quotes):
    hist = scd2_build(quotes, key="k", ts="qts", attrs=["px"], tie_break="seq")
    a = sorted(
        (r["version_no"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.where(F.col("k") == "a").collect()
    )
    # 4 versions; each valid_to == next valid_from; exactly one current
    assert [v for v, *_ in a] == [1, 2, 3, 4]
    for (v1, _, to1, cur1), (v2, frm2, _, _) in zip(a, a[1:]):
        assert to1 == frm2 and not cur1
    assert a[-1][3] is True
    # tie rows: seq=2 interval is zero-length [10:00, 10:00), seq=3 follows
    z = [r for r in a if r[1] == r[2]]
    assert len(z) == 1


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u", _ts("2024-01-01T10:00:00")),
        ("u", _ts("2024-01-01T10:29:00")),   # same session (gap 29min < 30)
        ("u", _ts("2024-01-01T11:00:00")),   # 31min -> new session
        ("u", _ts("2024-01-01T11:30:00")),   # exactly gap -> NOT new (strict >)
        ("v", _ts("2024-01-01T10:00:00")),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = sessionize(df, key="u", ts="ts", gap_seconds=1800)
    seqs = [r["session_seq"] for r in out.where("u = 'u'").orderBy("ts").collect()]
    assert seqs == [1, 1, 2, 2]
    assert out.where("u = 'v'").collect()[0]["session_seq"] == 1


@pytest.mark.parametrize("bucket_s", [60, 3600, 86_400 * 365])
def test_interval_join_bucket_width_invariance(spark, bucket_s):
    """Result set must not depend on bucket_seconds — intervals spanning
    many buckets dedupe to one pair, giant buckets still match."""
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01T12:00:00"), 1), ("k", _ts("2024-03-01T00:00:00"), 2)],
        "k string, pts timestamp, pid int",
    )
    ivals = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00"), 10)],
        "k string, s timestamp, e timestamp, iid int",
    )
    out = interval_join(
        points, ivals, on="k", left_ts="pts", right_start="s", right_end="e",
        bucket_seconds=bucket_s,
    )
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 10)]


def test_interval_join_plans_equi_join_not_nested_loop(spark):
    """The bucketing must turn the range predicate into an equi-join —
    a BroadcastNestedLoopJoin in the plan means the scale path failed."""
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01T12:00:00"), 1)], "k string, pts timestamp, pid int"
    )
    ivals = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00"), 10)],
        "k string, s timestamp, e timestamp, iid int",
    )
    out = interval_join(
        points, ivals, on="k", left_ts="pts", right_start="s", right_end="e",
        bucket_seconds=86_400,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01T12:00:00"), 1), ("k", _ts("2025-01-01T00:00:00"), 2)],
        "k string, pts timestamp, pid int",
    )
    ivals = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), 10)],
        "k string, s timestamp, e timestamp, iid int",
    )
    out = interval_join(
        points, ivals, on="k", left_ts="pts", right_start="s", right_end="e",
        bucket_seconds=3600, how="left",
    )
    got = {r["pid"]: r["iid"] for r in out.collect()}
    assert got == {1: 10, 2: None}


def test_interval_inclusive_endpoints(spark):
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), 1), ("k", _ts("2024-01-02T00:00:00"), 2),
         ("k", _ts("2024-01-02T00:00:01"), 3)],
        "k string, pts timestamp, pid int",
    )
    ivals = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), 10)],
        "k string, s timestamp, e timestamp, iid int",
    )
    out = interval_join(
        points, ivals, on="k", left_ts="pts", right_start="s", right_end="e",
        bucket_seconds=3600,
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_asof_equals_scd2_between_lookup(spark, quotes, trades):
    """The documented equivalence (temporal.py module docstring): as-of
    joining a fact stream against versioned rows gives the same answer as
    a BETWEEN [valid_from, valid_to) lookup against the SCD2 build of
    those rows."""
    asof = asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="seq", how="inner",
    ).select("trade_id", "px")
    hist = scd2_build(quotes, key="k", ts="qts", attrs=["px"], tie_break="seq")
    via_scd2 = (
        trades.join(hist, on="k")
        .where(
            (F.col("tts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("tts") < F.col("valid_to")))
        )
        .select("trade_id", "px")
    )
    assert sorted(asof.collect()) == sorted(via_scd2.collect())


# ---------------------------------------------------------------------------
# KMV sketches
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = spark.range(50).select(F.lit("g").alias("g"), F.col("id"))
    out = kmv_distinct(df, ["g"], kmv_hash_sha2(F.col("id")), k=256).collect()[0]
    assert out["n_kept"] == 50 and out["distinct_est"] == 50


def test_kmv_estimate_within_error_bound(spark):
    """k=256 → ~6% standard error; assert within 4 sigma on 100k distinct."""
    df = spark.range(100_000).select(F.lit("g").alias("g"), F.col("id"))
    est = kmv_distinct(df, ["g"], kmv_hash_sha2(F.col("id")), k=256).collect()[0]["distinct_est"]
    assert abs(est - 100_000) < 100_000 * 0.25, est
    # duplicates must not move the estimate at all (hash-distinct first)
    dup = df.unionAll(df).unionAll(df)
    est2 = kmv_distinct(dup, ["g"], kmv_hash_sha2(F.col("id")), k=256).collect()[0]["distinct_est"]
    assert est2 == est


def test_kmv_poly_hash_matches_manual(spark):
    got = (
        spark.range(5)
        .select(kmv_hash_poly(F.col("id"), mult=7, domain=10).alias("h"))
        .collect()
    )
    assert [r["h"] for r in got] == [(i * 7) % 10 for i in range(5)]


def test_kmv_union_estimate_merges_sketches(spark):
    """Union cardinality from two k-long sketches alone: overlapping sets
    a=[0,60k), b=[40k,100k) → union 100k, never touching raw rows again."""
    k = 512
    a = spark.range(0, 60_000).select(F.lit("g").alias("g"), F.col("id"))
    b = spark.range(40_000, 100_000).select(F.lit("g").alias("g"), F.col("id"))
    sa = kmv_sketch(a, ["g"], kmv_hash_sha2(F.col("id")), k=k)
    sb = kmv_sketch(b, ["g"], kmv_hash_sha2(F.col("id")), k=k)
    assert len(sa.collect()[0]["kmv"]) == k
    est = kmv_union_estimate(sa, sb, on=["g"], k=k).collect()[0]["distinct_est"]
    assert abs(est - 100_000) < 100_000 * 0.20, est


def test_kmv_distinct_poly_domain_exact_cross_engine(spark):
    """The oracle-pairing configuration (poly hash, integer estimate) must
    be reproducible by plain python integer arithmetic — the determinism
    contract the DuckDB oracle relies on."""
    ids = list(range(0, 5000, 3))
    df = spark.createDataFrame([("g", i) for i in ids], "g string, id long")
    k = 64
    out = kmv_distinct(df, ["g"], kmv_hash_poly(F.col("id")), k=k, domain=POLY_DOMAIN).collect()[0]
    hs = sorted((i * 1_000_003) % POLY_DOMAIN for i in set(ids))[:k]
    assert out["kth_hash"] == hs[-1]
    assert out["distinct_est"] == (k - 1) * POLY_DOMAIN // hs[-1]


# -- quantile sketch (bottom-k-by-hash uniform sample) -----------------------


def test_quantile_sketch_exact_below_k(spark):
    """With the whole group inside the sample, estimates ARE percentile_disc."""
    from jurisprudencia_privada_etl_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    df = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id"), (F.col("id") * 2).cast("double").alias("v")
    )
    sk = quantile_sketch(df, ["g"], "v", kmv_hash_sha2(F.col("id")), k=256)
    got = {
        r["q"]: r["value"]
        for r in quantile_estimate(sk, ["g"], [0.5, 0.9, 0.99]).collect()
    }
    # rank ceil(q*100) of values 0,2,...,198 -> value 2*(ceil(q*100)-1)
    assert got == {0.5: 98.0, 0.9: 178.0, 0.99: 196.0}


def test_quantile_sketch_merge_equals_single_pass(spark):
    """Bottom-k exactness: union of two sketches == sketch of the union."""
    from jurisprudencia_privada_etl_spark.operators.sketches import (
        quantile_sketch,
        quantile_union,
    )

    base = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id"),
        F.pmod(F.col("id") * 37, F.lit(1000)).cast("double").alias("v"),
    )
    h = kmv_hash_sha2(F.col("id"))
    a, b = base.where("id % 2 = 0"), base.where("id % 2 = 1")
    merged = quantile_union(
        quantile_sketch(a, ["g"], "v", h, k=64),
        quantile_sketch(b, ["g"], "v", h, k=64),
        ["g"],
        k=64,
    )
    single = quantile_sketch(base, ["g"], "v", h, k=64)
    ms = {r["g"]: (r["n_sample"], r["qsk"]) for r in merged.collect()}
    ss = {r["g"]: (r["n_sample"], r["qsk"]) for r in single.collect()}
    assert ms == ss


def test_quantile_sketch_estimate_near_truth_and_partition_independent(spark):
    from jurisprudencia_privada_etl_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    df = spark.range(20000).select(
        F.lit("g").alias("g"), F.col("id"), F.col("id").cast("double").alias("v")
    )
    h = kmv_hash_sha2(F.col("id"))
    est = {
        r["q"]: r["value"]
        for r in quantile_estimate(
            quantile_sketch(df, ["g"], "v", h, k=1024), ["g"], [0.5, 0.9]
        ).collect()
    }
    # uniform 0..19999: p50 ~ 10000, p90 ~ 18000; k=1024 -> ~3% standard error
    assert abs(est[0.5] - 10000) < 1500 and abs(est[0.9] - 18000) < 1500
    est13 = {
        r["q"]: r["value"]
        for r in quantile_estimate(
            quantile_sketch(df.repartition(13), ["g"], "v", h, k=1024), ["g"], [0.5, 0.9]
        ).collect()
    }
    assert est13 == est

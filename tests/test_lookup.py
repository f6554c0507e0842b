"""Point lookups + per-key history (the read-side complement of the
key-stats sidecar): driver-side bucket computation via the pure-Python
xxhash64 twin, pruned + pushed-down scans, and the audit walk of one key
across retained snapshots."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.functions.hashing import (
    xxhash64_py,
    xxhash64_strings_py,
)
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]


def _log(spark, n=2500, epochs=3, seed=23):
    return synthetic_changelog(
        spark, n, seed=seed, n_epochs=epochs, n_repos=8, paths_per_repo=60,
        pct_update=0.4, pct_delete=0.15,
    )


# -- the pure-Python xxhash64 twin -------------------------------------------


def test_xxhash64_py_matches_spark(spark):
    """Bit-parity with the JVM xxhash64 across every tail-length class
    (0 / <4 / <8 / <32 / multiple-of-32 / long), multi-byte UTF-8, and
    bytes >0x7F (the signedness trap)."""
    samples = [
        "",
        "a",
        "abc",
        "abcd",
        "abcde",
        "1234567",
        "12345678",
        "123456789",
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "y" * 100,
        "Acórdão nº 42 — secção cível",  # multi-byte UTF-8, bytes > 0x7F
        "repo/path/with/slashes.py",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert xxhash64_py(s.encode("utf-8")) == got[s], repr(s)


def test_xxhash64_chain_matches_bucket_of(spark):
    """Two-column chain parity — the driver-side bucket id must equal the
    write path's ``bucket_of`` for every key."""
    from jurisprudencia_privada_etl_spark.plans.sink import bucket_of

    keys = [(f"repo{i}", f"src/dir{i % 7}/f{i}.py") for i in range(200)]
    keys.append(("órgão", "ações/decisão.md"))
    df = spark.createDataFrame(keys, ["repo", "path"])
    got = df.select("repo", "path", bucket_of(64).alias("b")).collect()
    for r in got:
        assert xxhash64_strings_py(r["repo"], r["path"]) % 64 == r["b"]


# -- lookup ---------------------------------------------------------------


def test_lookup_matches_full_scan_filter(spark, tmp_path):
    log = _log(spark)
    pdf = log.toPandas()
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    expected = oracle_reduce(pdf)
    live = list(expected[["repo", "path"]].itertuples(index=False, name=None))
    # live keys + a deleted key + a never-seen key
    last = pdf.sort_values("ordinal").groupby(["repo", "path"], as_index=False).last()
    dead = last[last["op"] == "D"][["repo", "path"]]
    keys = live[:3] + list(dead.head(1).itertuples(index=False, name=None))
    keys.append(("no-such-repo", "no/such/path"))
    got = sink.lookup(keys).select(*PAYLOAD).toPandas()
    want = expected[
        expected.apply(lambda r: (r["repo"], r["path"]) in set(keys), axis=1)
    ].reset_index(drop=True)
    assert len(got) == len(want) == 3  # deleted + missing keys return nothing
    merged = got.sort_values(["repo", "path"]).reset_index(drop=True)
    for col in PAYLOAD:
        pd.testing.assert_series_equal(
            merged[col], want[col], check_names=False, check_dtype=False, obj=col
        )


def test_lookup_mor_resolves_delta_stack(spark, tmp_path):
    """MoR buckets resolve base+deltas inside the pruned read."""
    log = _log(spark, seed=29)
    pdf = log.toPandas()
    sink = replay_dataframe(
        spark, log, str(tmp_path / "t"), ReplayConfig(write_mode="mor")
    )
    expected = oracle_reduce(pdf)
    keys = list(expected[["repo", "path"]].head(4).itertuples(index=False, name=None))
    got = (
        sink.lookup(keys)
        .select(*PAYLOAD)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = expected[
        expected.apply(lambda r: (r["repo"], r["path"]) in set(keys), axis=1)
    ].reset_index(drop=True)
    for col in PAYLOAD:
        pd.testing.assert_series_equal(
            got[col], want[col], check_names=False, check_dtype=False, obj=col
        )


def test_lookup_plan_prunes_buckets_and_pushes_keys(spark, tmp_path):
    """The scan must list ONLY the looked-up keys' bucket dirs (driver-side
    pruning — zero jobs) and carry the key equality into PushedFilters
    (row-group stats skipping inside the surviving files)."""
    log = _log(spark, seed=31)
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    expected = oracle_reduce(log.toPandas())
    r0, p0 = expected.iloc[0][["repo", "path"]]
    df = sink.lookup([(r0, p0)])
    b = xxhash64_strings_py(r0, p0) % sink.manifest().n_buckets
    files = df.inputFiles()
    assert files, "lookup scan lists no files"
    assert all(f"_bucket={b}/" in f for f in files), files[:3]
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "repo" in pushed and "path" in pushed


def test_key_history_walks_snapshots(spark, tmp_path):
    """One row per readable snapshot where the key was live, with the
    snapshot version + epoch stamped; content matches the per-epoch oracle."""
    log = _log(spark, seed=37)
    pdf = log.toPandas()
    sink = replay_dataframe(spark, log, str(tmp_path / "t"))
    # a key updated across epochs: take the most-updated live key
    expected = oracle_reduce(pdf)
    counts = (
        pdf.groupby(["repo", "path"]).size().sort_values(ascending=False).reset_index()
    )
    live_keys = set(expected[["repo", "path"]].itertuples(index=False, name=None))
    r0, p0 = next(
        (r, p)
        for r, p in counts[["repo", "path"]].itertuples(index=False, name=None)
        if (r, p) in live_keys
    )
    hist = sink.key_history(r0, p0).toPandas().sort_values("snapshot_version")
    merges = {
        s["version"]: s["last_committed_epoch"]
        for s in sink.snapshots()
        if s["operation"] == "merge"
    }
    for _, row in hist.iterrows():
        assert row["as_of_epoch"] == merges[row["snapshot_version"]]
        upto = pdf[pdf["epoch"] <= row["as_of_epoch"]]
        exp = oracle_reduce(upto)
        exp_row = exp[(exp["repo"] == r0) & (exp["path"] == p0)]
        assert len(exp_row) == 1
        assert row["content_sha"] == exp_row.iloc[0]["content_sha"]
    # the key is live at the final epoch, so the newest merge version appears
    assert hist["snapshot_version"].max() == max(merges)

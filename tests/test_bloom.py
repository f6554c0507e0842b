"""Parquet split-block bloom filters on the key columns (opt-in via
``ReplayConfig.bloom_filter_ndv``): rows inside a bucket sit in key-HASH
order, so repo/path min/max row-group stats span nearly the whole domain
and prune nothing for a point lookup — the bloom bitset restores
"definitely absent" row-group skipping with zero page reads.

parquet-mr intentionally SKIPS the bitset for a column chunk that stays
fully dictionary-encoded (the dictionary page already answers exact
membership), so the assertion targets ``path`` — the high-cardinality half
of the key — and treats a missing ``repo`` bloom as correct when the repo
domain fits a dictionary."""

from __future__ import annotations

import glob
import os

import pandas as pd

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]


def _bloom_offsets(spark, parquet_file: str) -> dict[str, int]:
    """Column → bloom-filter footer offset (-1 = absent) for row group 0,
    read with parquet-mr through the session JVM (pyarrow doesn't expose
    bloom metadata)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path("file://" + parquet_file), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
    try:
        block = reader.getFooter().getBlocks().get(0)
        cols = block.getColumns()
        return {
            cols.get(i).getPath().toDotString(): cols.get(i).getBloomFilterOffset()
            for i in range(cols.size())
        }
    finally:
        reader.close()


def _wide_key_log(spark, seed=7):
    # 20k distinct paths over 4 repos: path overflows per-chunk dictionary
    # usefulness (bloom written), repo stays dictionary-encoded (bloom
    # correctly skipped by parquet-mr).
    return synthetic_changelog(
        spark, 20000, seed=seed, n_epochs=1, n_repos=4, paths_per_repo=5000,
        pct_update=0.0, pct_delete=0.0,
    )


def _data_files(table_dir: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(table_dir, "data", "v*", "**", "*.parquet"), recursive=True)
    )


def test_bloom_filters_written_on_key_columns(spark, tmp_path):
    log = _wide_key_log(spark)
    t = str(tmp_path / "t")
    replay_dataframe(spark, log, t, ReplayConfig(n_buckets=2, bloom_filter_ndv=10000))
    files = _data_files(t)
    assert files
    for f in files:
        offs = _bloom_offsets(spark, f)
        assert offs["path"] >= 0, f"no path bloom in {f}: {offs}"
        # non-key payload columns must NOT pay the bloom tax
        assert offs["content"] == -1 and offs["content_sha"] == -1, offs


def test_bloom_disabled_by_default(spark, tmp_path):
    log = _wide_key_log(spark, seed=11)
    t = str(tmp_path / "t")
    replay_dataframe(spark, log, t, ReplayConfig(n_buckets=2))
    for f in _data_files(t):
        offs = _bloom_offsets(spark, f)
        assert all(v == -1 for v in offs.values()), offs


def test_lookup_correct_on_bloom_table(spark, tmp_path):
    """Bloom metadata is pruning-only: point lookups (present AND absent
    keys) return exactly the oracle rows."""
    log = _wide_key_log(spark, seed=13)
    pdf = log.toPandas()
    sink = replay_dataframe(
        spark, log, str(tmp_path / "t"),
        ReplayConfig(n_buckets=2, bloom_filter_ndv=10000),
    )
    expected = oracle_reduce(pdf)
    keys = list(expected[["repo", "path"]].head(3).itertuples(index=False, name=None))
    keys.append(("no-such-repo", "no/such/path"))
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
    assert len(got) == len(want) == 3
    for col in PAYLOAD:
        pd.testing.assert_series_equal(
            got[col], want[col], check_names=False, check_dtype=False, obj=col
        )


def test_compaction_preserves_bloom_metadata(spark, tmp_path):
    """Every rewrite site (compact included) must re-apply the writer
    options, or maintenance would silently strip lookup pruning."""
    log = _wide_key_log(spark, seed=17)
    t = str(tmp_path / "t")
    sink = replay_dataframe(
        spark, log, t, ReplayConfig(n_buckets=2, bloom_filter_ndv=10000)
    )
    sink.compact()
    files = _data_files(t)
    latest = max(os.path.relpath(f, t).split(os.sep)[1] for f in files)
    compacted = [f for f in files if os.sep + latest + os.sep in f]
    assert compacted
    for f in compacted:
        assert _bloom_offsets(spark, f)["path"] >= 0, f

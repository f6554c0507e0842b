"""Metadata tables (sink.history / files / partitions) — the Iceberg
``history``/``files``/``partitions`` metadata-table / Delta DESCRIBE
HISTORY analog.

The contract under test: each surface is a queryable DataFrame built from
the manifest plus directory stats alone (no data-file reads), ``files``
enumerates exactly the physical parquet set the snapshot references
(base + MoR delta + DV sets, labeled by kind), ``history`` carries one row
per retained version with the right operation kind, and ``partitions``
aggregates per bucket consistently with ``files``.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog


def _log(spark, seed=977, n=1200, epochs=2):
    return synthetic_changelog(
        spark, n, seed=seed, n_epochs=epochs, n_repos=6, paths_per_repo=40,
        pct_update=0.4, pct_delete=0.1,
    )


def _referenced_parquet(table_path: str) -> set[str]:
    return {
        os.path.relpath(p, table_path)
        for p in glob.glob(os.path.join(table_path, "data", "**", "*.parquet"),
                           recursive=True)
    }


def test_files_enumerates_current_snapshot_exactly(spark, tmp_path):
    log = _log(spark)
    sink = replay_dataframe(spark, log, str(tmp_path / "t"),
                            ReplayConfig(n_buckets=8))
    f = sink.files().toPandas()
    assert set(f["kind"]) == {"base"}
    # every listed file exists with the listed size
    for _, r in f.iterrows():
        p = os.path.join(sink.table_path, r["path"])
        assert os.path.getsize(p) == r["size_bytes"]
    # after a merge cycle at this scale every live file is current-referenced
    # (older snapshot dirs may also exist until expiry, so files() must be a
    # subset of what's on disk and cover every bucket)
    assert set(f["path"]).issubset(_referenced_parquet(sink.table_path))
    assert set(f["bucket"]) == set(range(8))


def test_files_labels_delta_and_dv_kinds(spark, tmp_path):
    log = _log(spark, seed=431)
    head = log.agg(F.max("ordinal")).collect()[0][0]
    sink = replay_dataframe(
        spark, log, str(tmp_path / "mor"),
        ReplayConfig(n_buckets=4, write_mode="mor"),
    )
    sink.dv_delete("length(content) % 7 = 0", ordinal=head + 1)
    f = sink.files().toPandas()
    kinds = set(f["kind"])
    assert "delta" in kinds and "dv" in kinds
    # DV sets carry their manifest row count; tiny by construction
    dv = f[f["kind"] == "dv"]
    assert (dv["content_rows"] > 0).all()
    assert int(dv["size_bytes"].sum()) < 512 * 1024


def test_history_operations_and_partitions_consistency(spark, tmp_path):
    log = _log(spark, seed=113)
    # MoR leaves per-epoch delta stacks, so compact() has real work to fold
    # and publishes a "compact" snapshot
    sink = replay_dataframe(spark, log, str(tmp_path / "h"),
                            ReplayConfig(n_buckets=4, write_mode="mor"))
    sink.compact()
    h = sink.history().toPandas().sort_values("version")
    ops = list(h["operation"])
    assert ops[0] == "create" and ops[-1] == "compact" and "merge" in ops
    assert h["version"].is_monotonic_increasing
    assert h["readable"].all()

    p = sink.partitions().toPandas()
    f = sink.files().toPandas()
    assert int(p["n_files"].sum()) == len(f)
    assert int(p["total_bytes"].sum()) == int(f["size_bytes"].sum())
    assert set(p["bucket"]) == set(f["bucket"])

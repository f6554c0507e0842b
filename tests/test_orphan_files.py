"""remove_orphan_files: the maintenance op that sweeps crashed-attempt data
dirs expire_snapshots can never touch (dirs ABOVE the committed version),
with Iceberg's older-than horizon protecting genuinely in-flight writers."""

from __future__ import annotations

import os
import shutil

from jurisprudencia_privada_etl_spark.plans import manifest as mf
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import CHANGELOG_SCHEMA, TARGET_SCHEMA, TableSchema

OLD = 10.0  # horizon for tests; _age() pushes mtimes far past it


def _table(spark, tmp_path, n=60):
    sink = HadoopParquetSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    rows = [
        (0, i, "I", f"r{i % 5}", f"f{i}.py", f"c{i}", "py", f"body {i}")
        for i in range(n)
    ]
    process_epoch(spark, sink, spark.createDataFrame(rows, CHANGELOG_SCHEMA), 0, ReplayConfig())
    return sink


def _age(path: str, seconds: float = 3600.0) -> None:
    """Backdate mtimes recursively (the sweep checks the candidate dir)."""
    old = os.path.getmtime(path) - seconds
    for root, dirs, files in os.walk(path):
        for n in dirs + files:
            os.utime(os.path.join(root, n), (old, old))
    os.utime(path, (old, old))


def _fake_attempt(sink, version: int, bucket: int = 0) -> str:
    """Simulate a writer that crashed after its data write, before its
    manifest CAS: a tokenized dir at ``version`` no manifest references."""
    rel = os.path.join("data", f"v{version:08d}-deadbeef", f"_bucket={bucket}")
    d = os.path.join(sink.table_path, rel)
    os.makedirs(d)
    with open(os.path.join(d, "part-00000.parquet"), "wb") as f:
        f.write(b"x" * 128)
    return os.path.dirname(d)


def test_crashed_attempt_above_committed_swept_past_horizon(spark, tmp_path):
    sink = _table(spark, tmp_path)
    committed = mf.current_version(sink.table_path)
    vdir = _fake_attempt(sink, committed + 1)

    # expire_snapshots never considers dirs above the committed version
    sink.expire_snapshots(keep_last=1)
    assert os.path.isdir(vdir)

    # fresh mtime = could be an in-flight writer → protected
    r = sink.remove_orphan_files(older_than_s=OLD)
    assert r["orphan_dirs"] == [] and os.path.isdir(vdir)

    _age(vdir)
    before = sink.load().count()
    r = sink.remove_orphan_files(older_than_s=OLD)
    assert [os.path.basename(p) for p in r["orphan_dirs"]] == [os.path.basename(vdir)]
    assert r["orphan_files"] == 1 and r["orphan_bytes"] == 128
    assert not os.path.isdir(vdir)
    assert sink.load().count() == before  # live data untouched


def test_referenced_dirs_survive_any_age(spark, tmp_path):
    sink = _table(spark, tmp_path)
    data_root = os.path.join(sink.table_path, "data")
    for vdir in os.listdir(data_root):
        _age(os.path.join(data_root, vdir))
    before = sorted(os.listdir(data_root))
    r = sink.remove_orphan_files(older_than_s=OLD)
    assert r["orphan_dirs"] == []
    assert sorted(os.listdir(data_root)) == before
    assert sink.load().count() == 60


def test_cas_loser_at_committed_version_swept(spark, tmp_path):
    sink = _table(spark, tmp_path)
    committed = mf.current_version(sink.table_path)
    vdir = _fake_attempt(sink, committed)  # same version, different token
    _age(vdir)
    r = sink.remove_orphan_files(older_than_s=OLD)
    assert len(r["orphan_dirs"]) == 1
    assert not os.path.isdir(vdir)
    assert sink.load().count() == 60


def test_staged_wap_dirs_protected_regardless_of_age(spark, tmp_path):
    sink = _table(spark, tmp_path)
    rows = [(1, 1000 + i, "I", "r9", f"g{i}.py", "c", "py", "new") for i in range(5)]
    sink.merge(spark.createDataFrame(rows, CHANGELOG_SCHEMA), 1, stage=True)
    staged = mf.load_staged(sink.table_path)
    assert staged is not None
    data_root = os.path.join(sink.table_path, "data")
    for vdir in os.listdir(data_root):
        _age(os.path.join(data_root, vdir))
    r = sink.remove_orphan_files(older_than_s=OLD)
    assert r["orphan_dirs"] == []  # stage may sit un-audited for days
    sink.publish_staged()
    assert sink.load().count() == 65


def test_dry_run_reports_without_deleting(spark, tmp_path):
    sink = _table(spark, tmp_path)
    vdir = _fake_attempt(sink, mf.current_version(sink.table_path) + 3)
    _age(vdir)
    r = sink.remove_orphan_files(older_than_s=OLD, dry_run=True)
    assert len(r["orphan_dirs"]) == 1 and r["dry_run"]
    assert os.path.isdir(vdir)
    r2 = sink.remove_orphan_files(older_than_s=OLD)
    assert r2["orphan_dirs"] == r["orphan_dirs"]
    assert not os.path.isdir(vdir)


def test_partial_reference_sweeps_only_unreferenced_buckets(spark, tmp_path):
    """Manual-surgery case: an attempt dir where SOME buckets are live —
    only the unreferenced bucket subdirs go."""
    sink = _table(spark, tmp_path)
    m = sink.manifest()
    entry = next(iter(m.buckets.values()))
    vpath = os.path.join(
        sink.table_path, os.path.dirname(os.path.normpath(entry["path"]))
    )
    stray = os.path.join(vpath, "_bucket=999")
    os.makedirs(stray)
    with open(os.path.join(stray, "junk.parquet"), "wb") as f:
        f.write(b"y" * 64)
    _age(vpath)
    r = sink.remove_orphan_files(older_than_s=OLD)
    assert [os.path.basename(p) for p in r["orphan_dirs"]] == ["_bucket=999"]
    assert not os.path.isdir(stray)
    assert sink.load().count() == 60

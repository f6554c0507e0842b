"""Optimistic-concurrency commits (Iceberg metadata-pointer CAS parity).

``manifest.publish`` is an atomic create-if-not-exists: of two writers
racing to commit the same snapshot version, exactly one wins.  A losing
merge that raced a twin of the SAME epoch reports a skip (exactly-once);
a losing merge that raced a DIVERGENT write surfaces CommitConflictError
for a re-plan.  Before this, a plain rename let the last writer silently
clobber the first commit's bucket pointers.
"""

from __future__ import annotations

import pytest

from jurisprudencia_privada_etl_spark.plans import manifest as mf
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import TARGET_SCHEMA, TableSchema

from tests.test_fixtures import make_log


def _manifest(version, epoch, parent, schema):
    return mf.Manifest(
        version=version,
        last_committed_epoch=epoch,
        schema=schema,
        buckets={},
        n_buckets=64,
        metrics={"who": f"writer-of-v{version}"},
        parent_version=parent,
    )


def test_publish_same_version_raises_and_preserves_winner(tmp_path):
    table = str(tmp_path / "t")
    schema = TableSchema.from_struct(TARGET_SCHEMA)
    mf.publish(table, _manifest(1, 0, 0, schema))
    with pytest.raises(mf.CommitConflictError):
        mf.publish(table, _manifest(1, 5, 0, schema))
    m = mf.load(table, 1)
    assert m.last_committed_epoch == 0  # first writer's commit intact
    assert m.metrics["who"] == "writer-of-v1"
    # the loser's temp file must not linger
    import os

    leftovers = [f for f in os.listdir(f"{table}/{mf.MANIFEST_DIR}") if f.endswith(".tmp")]
    assert leftovers == []


def test_publish_overwrite_rewrites_metadata_in_place(tmp_path):
    table = str(tmp_path / "t")
    schema = TableSchema.from_struct(TARGET_SCHEMA)
    mf.publish(table, _manifest(1, 0, 0, schema))
    tagged = _manifest(1, 0, 0, schema)
    tagged.metrics["schema_only_retained"] = True
    mf.publish(table, tagged, overwrite=True)
    assert mf.load(table, 1).metrics["schema_only_retained"] is True


def _race(monkeypatch, sink, competing_epoch):
    """Arm a one-shot race: the next merge's own publish is preceded by a
    competing writer committing the same version number."""
    original = mf.publish
    fired = {"done": False}

    def wrapper(table_path, manifest, overwrite=False):
        if not fired["done"] and not overwrite:
            fired["done"] = True
            original(
                table_path,
                _manifest(
                    manifest.version, competing_epoch, manifest.parent_version, manifest.schema
                ),
            )
        return original(table_path, manifest, overwrite=overwrite)

    monkeypatch.setattr(mf, "publish", wrapper)


def test_losing_race_to_same_epoch_twin_reports_skip(spark, tmp_path, monkeypatch):
    """Two drivers replaying the same changelog race epoch 0: the loser
    must land on the exactly-once skip path, and the table state is the
    winner's commit."""
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    _race(monkeypatch, sink, competing_epoch=0)
    res = process_epoch(
        spark, sink, make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1")]), 0,
        ReplayConfig(),
    )
    assert res.get("skipped") is True
    assert "race" in res["reason"]
    assert sink.manifest().last_committed_epoch == 0


def test_losing_race_to_divergent_write_raises(spark, tmp_path, monkeypatch):
    """The competing commit did NOT apply this epoch (e.g. a concurrent
    maintenance snapshot): the merge's parent is stale — it must raise,
    never silently clobber or silently skip."""
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    _race(monkeypatch, sink, competing_epoch=-1)  # competing write, epoch NOT applied
    with pytest.raises(mf.CommitConflictError):
        process_epoch(
            spark, sink, make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1")]), 0,
            ReplayConfig(),
        )
    # table state is the winner's: version advanced, epoch still unapplied
    m = sink.manifest()
    assert m.last_committed_epoch == -1
    # a plain re-run on the fresh snapshot converges
    monkeypatch.setattr(mf, "publish", mf.publish)  # disarm (no-op set)
    res = process_epoch(
        spark, sink, make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1")]), 0,
        ReplayConfig(),
    )
    assert res.get("skipped") is not True
    assert sink.manifest().last_committed_epoch == 0
    assert sink.load().count() == 1


def test_mor_merge_loses_race_reports_skip(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path, write_mode="mor")
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    # epoch 0 lands a base; the raced epoch 1 exercises _merge_mor's commit
    process_epoch(
        spark, sink, make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1")]), 0,
        ReplayConfig(),
    )
    _race(monkeypatch, sink, competing_epoch=1)
    res = process_epoch(
        spark, sink, make_log(spark, [(1, 2, "U", "r1", "a.py", "c2", "py", "v2")]), 1,
        ReplayConfig(),
    )
    assert res.get("skipped") is True and "race" in res["reason"]


def test_losing_writer_data_files_never_clobber_winner(spark, tmp_path, monkeypatch):
    """The hazard tokenized data dirs exist for: writer A commits v2, then
    a slower writer B — which planned the same v2 before A landed — WRITES
    its data files and only then loses the manifest CAS.  With a shared
    ``data/v2`` dir, B's ``mode("overwrite")`` write would destroy the
    files A's committed manifest points at; per-attempt ``v2-{token}``
    dirs keep the writes disjoint.  B's orphan dir (version ≤ committed,
    unreferenced) is then reclaimed by expire_snapshots."""
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    cfg = ReplayConfig()
    process_epoch(
        spark, sink, make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "base")]), 0, cfg
    )

    winner = HadoopParquetSink(spark, path)
    original = HadoopParquetSink._new_data_dir
    fired = {"done": False}

    def wrapper(self, new_version):
        # one-shot: the loser reaches its data write → the winner's full
        # merge (data + manifest CAS) lands first, then the loser writes
        if not fired["done"]:
            fired["done"] = True
            process_epoch(
                spark, winner,
                make_log(spark, [(1, 2, "U", "r1", "a.py", "c2", "py", "winner")]), 1, cfg,
            )
        return original(self, new_version)

    monkeypatch.setattr(HadoopParquetSink, "_new_data_dir", wrapper)
    res = process_epoch(
        spark, sink, make_log(spark, [(1, 3, "U", "r1", "a.py", "c3", "py", "loser")]), 1, cfg
    )
    monkeypatch.setattr(HadoopParquetSink, "_new_data_dir", original)
    assert res.get("skipped") is True and "race" in res["reason"]

    # the winner's committed files survived the loser's later write
    import os

    rows = {(r["path"], r["content"]) for r in sink.load().collect()}
    assert rows == {("a.py", "winner")}
    m = sink.manifest()
    assert m.version == 2
    v2_dirs = [
        d for d in os.listdir(os.path.join(path, "data"))
        if HadoopParquetSink._dir_version(d) == 2
    ]
    assert len(v2_dirs) == 2, "winner's dir + loser's orphan must both exist pre-GC"

    # expire reclaims the orphan but keeps every referenced dir readable
    sink.expire_snapshots(keep_last=1)
    referenced = {ref["path"].split(os.sep)[1] for ref in sink.manifest().buckets.values()}
    survivors = {
        d for d in os.listdir(os.path.join(path, "data"))
        if HadoopParquetSink._dir_version(d) == 2
        and any(os.scandir(os.path.join(path, "data", d)))
    }
    assert survivors == referenced
    assert {(r["path"], r["content"]) for r in sink.load().collect()} == {("a.py", "winner")}


def test_reader_is_snapshot_isolated_across_concurrent_commits(spark, tmp_path):
    """A reader planned at version V still collects V's exact rows after
    later merges AND a compaction rewrite land — copy-on-write means a
    snapshot's files are immutable until expire_snapshots reclaims them,
    so long-running queries never see torn state on a live table."""
    path = str(tmp_path / "t")
    sink = HadoopParquetSink(spark, path)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    cfg = ReplayConfig()
    process_epoch(
        spark, sink, make_log(spark, [(0, 1, "I", "r1", "a.py", "c1", "py", "v1"),
                                      (0, 2, "I", "r1", "b.py", "c2", "ts", "v2")]), 0, cfg
    )
    v = sink.manifest().version
    reader = sink.load(version=v)  # planned now, collected after the commits
    process_epoch(
        spark, sink, make_log(spark, [(1, 3, "U", "r1", "a.py", "c3", "py", "v1-new"),
                                      (1, 4, "D", "r1", "b.py", None, None, None)]), 1, cfg
    )
    sink.compact(target_files_per_bucket=1, min_files=0)
    got = {(r["path"], r["content"]) for r in reader.collect()}
    assert got == {("a.py", "v1"), ("b.py", "v2")}
    now = {(r["path"], r["content"]) for r in sink.load().collect()}
    assert now == {("a.py", "v1-new")}

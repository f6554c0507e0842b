"""Anti-entropy replica repair (operators/antientropy.py): per-bucket
digests detect drift, repair rewrites ONLY the divergent buckets with the
primary's rows verbatim, and a converged pair is a no-op."""

from __future__ import annotations

import os
import shutil

from jurisprudencia_privada_etl_spark.functions.hashing import xxhash64_strings_py
from jurisprudencia_privada_etl_spark.operators.antientropy import (
    bucket_digests,
    diverged_buckets,
    repair_replica,
)
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, process_epoch
from jurisprudencia_privada_etl_spark.plans.sink import HadoopParquetSink
from jurisprudencia_privada_etl_spark.schemas import (
    CHANGELOG_SCHEMA,
    TARGET_SCHEMA,
    TableSchema,
)

N_BUCKETS = 8


def _primary(spark, tmp_path, n=120):
    """Two epochs with updates + deletes so retained tombstones are part of
    the replicated state being compared."""
    sink = HadoopParquetSink(spark, str(tmp_path / "primary"), n_buckets=N_BUCKETS)
    sink.create(TableSchema.from_struct(TARGET_SCHEMA))
    e0 = [
        (0, i, "I", f"r{i % 7}", f"f{i}.py", f"c{i}", "py", f"body {i}")
        for i in range(n)
    ]
    e1 = [
        (1, n + i, "U", f"r{i % 7}", f"f{i}.py", f"c{n + i}", "py", f"body v2 {i}")
        for i in range(0, n, 3)
    ] + [
        (1, 2 * n + i, "D", f"r{i % 7}", f"f{i}.py", f"c{2 * n + i}", "py", None)
        for i in range(1, n, 9)
    ]
    cfg = ReplayConfig(n_buckets=N_BUCKETS)
    process_epoch(spark, sink, spark.createDataFrame(e0, CHANGELOG_SCHEMA), 0, cfg)
    process_epoch(spark, sink, spark.createDataFrame(e1, CHANGELOG_SCHEMA), 1, cfg)
    return sink


def _clone(spark, sink, tmp_path, name="replica"):
    dst = str(tmp_path / name)
    shutil.copytree(sink.table_path, dst)
    return HadoopParquetSink(spark, dst, n_buckets=N_BUCKETS)


def test_repair_noop_when_converged(spark, tmp_path):
    primary = _primary(spark, tmp_path)
    replica = _clone(spark, primary, tmp_path)
    v = replica.manifest().version
    r = repair_replica(primary, replica)
    assert r == {"diverged_buckets": [], "repaired_buckets": 0, "rows_copied": 0}
    assert replica.manifest().version == v  # no empty commit


def test_repair_converges_tampered_replica_and_prunes_clean_buckets(spark, tmp_path):
    primary = _primary(spark, tmp_path)
    replica = _clone(spark, primary, tmp_path)
    # legitimate local drift: a purge that never happened on the primary
    replica.delete_where("path in ('f0.py', 'f3.py')", ordinal=10_000)

    before = {b: e["path"] for b, e in replica.manifest().buckets.items()}
    div = diverged_buckets(primary, replica)
    assert div  # drift detected
    expect = sorted(
        {xxhash64_strings_py(f"r{i % 7}", f"f{i}.py") % N_BUCKETS for i in (0, 3)}
    )
    assert div == expect  # exactly the tampered keys' buckets

    # the healing read opens ONLY divergent buckets' files on the primary
    pruned = primary.load(buckets=div, include_tombstones=True)
    m = primary.manifest()
    allowed = {
        os.path.join(primary.table_path, m.buckets[str(b)]["path"]) for b in div
    }
    scanned = {os.path.dirname(f.split("://", 1)[-1]) for f in pruned.inputFiles()}
    assert scanned <= allowed

    r = repair_replica(primary, replica)
    assert r["repaired_buckets"] == len(div) and r["rows_copied"] > 0
    assert diverged_buckets(primary, replica) == []  # converged, tombstones included
    after = replica.manifest()
    assert after.metrics["operation"] == "repair"
    for b, path in before.items():
        if int(b) not in div:  # clean buckets carried forward by reference
            assert after.buckets[b]["path"] == path
    # idempotent: second pass is a no-op
    v = after.version
    assert repair_replica(primary, replica)["repaired_buckets"] == 0
    assert replica.manifest().version == v


def test_repair_detects_lost_tombstone(spark, tmp_path):
    """A replica that vacuumed tombstones the primary retains would
    resurrect deleted keys on the next stale event — that IS divergence."""
    primary = _primary(spark, tmp_path)
    replica = _clone(spark, primary, tmp_path)
    replica.vacuum(retain_after_ordinal=10_000)  # strips every tombstone
    div = diverged_buckets(primary, replica)
    assert div
    repair_replica(primary, replica)
    assert diverged_buckets(primary, replica) == []
    # the tombstones are physically back
    live = replica.load(include_tombstones=True)
    assert live.where("deleted").count() > 0


def test_repair_drops_rogue_bucket_empty_on_primary(spark, tmp_path):
    """A rogue insert whose key hashes to a bucket the primary never wrote:
    repair must DROP that manifest entry, not leave a ghost bucket."""
    primary = _primary(spark, tmp_path, n=3)  # few keys -> most buckets empty
    replica = _clone(spark, primary, tmp_path)
    used = {int(b) for b in primary.manifest().buckets}
    key = next(
        f"g{i}.py"
        for i in range(1000)
        if xxhash64_strings_py("rogue", f"g{i}.py") % N_BUCKETS not in used
    )
    rogue = [(2, 900, "I", "rogue", key, "cx", "py", "rogue body")]
    process_epoch(
        spark,
        replica,
        spark.createDataFrame(rogue, CHANGELOG_SCHEMA),
        2,
        ReplayConfig(n_buckets=N_BUCKETS),
    )
    b = xxhash64_strings_py("rogue", key) % N_BUCKETS
    assert str(b) in replica.manifest().buckets
    r = repair_replica(primary, replica)
    assert b in r["diverged_buckets"]
    assert str(b) not in replica.manifest().buckets
    assert diverged_buckets(primary, replica) == []


def test_repair_guards_on_bucketing_and_schema_drift(spark, tmp_path):
    import pytest

    from jurisprudencia_privada_etl_spark.schemas import SchemaChange

    primary = _primary(spark, tmp_path, n=30)
    replica = _clone(spark, primary, tmp_path)
    replica.rebucket(16)
    with pytest.raises(ValueError, match="bucket layouts differ"):
        diverged_buckets(primary, replica)

    replica2 = _clone(spark, primary, tmp_path, name="replica2")
    replica2.evolve([SchemaChange("add", "stars", dtype="int")])
    with pytest.raises(ValueError, match="schemas differ"):
        diverged_buckets(primary, replica2)


def test_bucket_digests_partitioning_independent(spark, tmp_path):
    """Digest values must not depend on how the scan parallelized — the
    cross-checkable contract that lets the REPLICA side run anywhere."""
    primary = _primary(spark, tmp_path)
    a = {
        r["bucket"]: (r["n_rows"], r["digest_xor"], r["digest_sum"])
        for r in bucket_digests(primary).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = {
            r["bucket"]: (r["n_rows"], r["digest_xor"], r["digest_sum"])
            for r in bucket_digests(primary).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 0

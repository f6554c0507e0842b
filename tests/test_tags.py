"""Named refs (tags): retention pins on snapshot versions — the Iceberg
tag analog.  A tagged version survives expire_snapshots fully readable;
dropping the tag releases it to GC."""

from __future__ import annotations

import pytest

from jurisprudencia_privada_etl_spark.plans.replay import replay_dataframe
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

from tests.conftest import assert_state_equal, oracle_reduce

PAYLOAD = ["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]


def _table(spark, tmp_path, epochs=4):
    log = synthetic_changelog(
        spark, 3000, seed=53, n_epochs=epochs, n_repos=8, paths_per_repo=60,
        pct_update=0.4, pct_delete=0.15,
    )
    return log.toPandas(), replay_dataframe(spark, log, str(tmp_path / "t"))


def test_tagged_version_survives_expiry_readable(spark, tmp_path):
    pdf, sink = _table(spark, tmp_path)
    merges = {
        s["last_committed_epoch"]: s["version"]
        for s in sink.snapshots()
        if s["operation"] == "merge"
    }
    v_epoch1 = merges[1]
    sink.tag("audit-cut", version=v_epoch1)
    sink.expire_snapshots(keep_last=1)
    snaps = {s["version"]: s for s in sink.snapshots()}
    assert snaps[v_epoch1]["readable"]
    assert snaps[v_epoch1]["tags"] == ["audit-cut"]
    got = sink.load_tag("audit-cut").select(*PAYLOAD).toPandas()
    assert_state_equal(got, oracle_reduce(pdf[pdf["epoch"] <= 1]))
    # an untagged sibling version of similar age is schema-only or gone
    v_epoch0 = merges[0]
    assert v_epoch0 not in snaps or not snaps[v_epoch0]["readable"]


def test_drop_tag_releases_version_to_gc(spark, tmp_path):
    pdf, sink = _table(spark, tmp_path)
    merges = {
        s["last_committed_epoch"]: s["version"]
        for s in sink.snapshots()
        if s["operation"] == "merge"
    }
    sink.tag("temp-pin", version=merges[1])
    sink.expire_snapshots(keep_last=1)
    assert {s["version"]: s for s in sink.snapshots()}[merges[1]]["readable"]
    assert sink.drop_tag("temp-pin")
    assert not sink.drop_tag("temp-pin")  # idempotent
    sink.expire_snapshots(keep_last=1)
    snaps = {s["version"]: s for s in sink.snapshots()}
    assert merges[1] not in snaps or not snaps[merges[1]]["readable"]
    with pytest.raises(KeyError):
        sink.load_tag("temp-pin")


def test_tag_defaults_to_current_and_rejects_unreadable(spark, tmp_path):
    pdf, sink = _table(spark, tmp_path)
    cur = sink.manifest().version
    refs = sink.tag("prod")
    assert refs["prod"] == cur == sink.tags()["prod"]
    # retag moves the pin
    merges = sorted(
        s["version"] for s in sink.snapshots() if s["operation"] == "merge"
    )
    sink.tag("prod", version=merges[-2])
    assert sink.tags()["prod"] == merges[-2]
    sink.drop_tag("prod")
    # expire, then try to tag a schema-only-retained version
    sink.expire_snapshots(keep_last=1)
    unreadable = [s for s in sink.snapshots() if not s["readable"]]
    if unreadable:
        with pytest.raises(ValueError):
            sink.tag("bad", version=unreadable[0]["version"])

"""The north rule's deployment clause, executed for real: the engine runs
via ``spark-submit --py-files engine.zip`` on a multi-executor cluster.

``local-cluster[2,2,2048]`` is Spark's testing master that launches TWO
SEPARATE executor JVMs (own processes, own python workers) — the closest a
single host gets to a real cluster: the zip must actually ship to executors
for their python workers to import the package, unlike ``local[N]`` where
the driver's sys.path quietly serves everyone.  PYTHONPATH is stripped and
the subprocess runs from a neutral cwd, so the ONLY way the package resolves
is through the --py-files artifact.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from jurisprudencia_privada_etl_spark.operators.fsck import digests_equal, table_digest
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay
from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN, HadoopParquetSink

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = "/opt/spark"
SPARK_SUBMIT = os.path.join(SPARK_HOME, "bin", "spark-submit")


def _submit(args: list[str], cwd: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_HOME"] = SPARK_HOME
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local-cluster[2,2,2048]", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=400,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # the result is the last JSON line on stdout (log4j noise goes to stderr)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark distribution")
def test_spark_submit_pyfiles_on_two_executor_cluster(spark, tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_pyfiles", os.path.join(REPO, "scripts", "build_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.build(REPO, zip_path)

    clog, table = str(tmp_path / "clog"), str(tmp_path / "table")
    script = os.path.join(REPO, "scripts", "run_replay.py")
    r1 = _submit(
        ["--py-files", zip_path, script,
         "--generate", "2000", "--changelog", clog, "--table", table],
        cwd=str(tmp_path),
    )
    assert r1["last_committed_epoch"] == 3 and r1["version"] == 4

    # exactly-once across a full cluster restart: a second submit over the
    # same changelog is a no-op (same epoch, same version, no new snapshot)
    r2 = _submit(
        ["--py-files", zip_path, script, "--changelog", clog, "--table", table],
        cwd=str(tmp_path),
    )
    assert (r2["last_committed_epoch"], r2["version"]) == (
        r1["last_committed_epoch"], r1["version"],
    )

    # the cluster-produced state is row-for-row the state an independent
    # in-process replay of the same changelog converges to (config-agnostic:
    # digest is order/partitioning-independent, so different bucket counts
    # compare equal)
    local_sink = replay(
        spark, clog, str(tmp_path / "table_local"), ReplayConfig(n_buckets=8)
    )
    cluster = HadoopParquetSink(spark, table).load()
    local = local_sink.load()
    cols = sorted(set(cluster.columns) & set(local.columns) - {BUCKET_COLUMN})
    assert digests_equal(
        table_digest(cluster.select(*cols), cols),
        table_digest(local.select(*cols), cols),
    )

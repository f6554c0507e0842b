#!/usr/bin/env python3
"""A/B the headline replay's ``files_per_bucket`` (round-3 judge item #1).

Round 3 switched the benched config from f=1 to f=4 and the bare replay went
8.83s → 10.96s; this script decides whether that was the config or the host.
Protocol (same as BENCH/BASELINE.md): ONE Spark session, one generated
changelog, one warmup, then the configs run INTERLEAVED per round so host
drift cannot split them.  Prints one JSON line; paste into
BENCH/ab_files_per_bucket.md.

Usage: python scripts/ab_files_per_bucket.py [n_events] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay  # noqa: E402
from jurisprudencia_privada_etl_spark.session import get_spark  # noqa: E402
from jurisprudencia_privada_etl_spark.sources.changelog import write_changelog  # noqa: E402
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fs = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3 else [1, 2, 4])]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(
        "ab_fpb",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus * 2)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    workdir = tempfile.mkdtemp(prefix="ab_fpb_")
    clog = os.path.join(workdir, "changelog")
    gen_parts = max(cpus, n_events // 100_000)
    log = synthetic_changelog(
        spark, n_events, seed=42, n_epochs=2, n_repos=2000, paths_per_repo=4000,
        skew=3.0, pct_update=0.35, pct_delete=0.10, num_partitions=gen_parts,
    )
    write_changelog(log, clog)

    # warmup (JIT, python workers, page cache)
    replay(spark, clog, os.path.join(workdir, "wt"),
           ReplayConfig(n_salts=16, n_buckets=128, files_per_bucket=1))

    results: dict[int, list[float]] = {f: [] for f in fs}
    for r in range(rounds):
        for f in fs:
            table = os.path.join(workdir, f"t_{f}_{r}")
            t0 = time.time()
            replay(spark, clog, table,
                   ReplayConfig(n_salts=16, n_buckets=128, files_per_bucket=f))
            dt = time.time() - t0
            results[f].append(round(dt, 2))
            shutil.rmtree(table, ignore_errors=True)
            print(f"  round {r} f={f}: {dt:.2f}s", file=sys.stderr)

    shutil.rmtree(workdir, ignore_errors=True)
    out = {
        "n_events": n_events,
        "cpus": cpus,
        "rounds": rounds,
        "times_sec": {str(f): results[f] for f in fs},
        "best_sec": {str(f): min(results[f]) for f in fs},
        "median_sec": {str(f): sorted(results[f])[len(results[f]) // 2] for f in fs},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

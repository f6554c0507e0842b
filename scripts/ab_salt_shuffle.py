#!/usr/bin/env python3
"""A/B the pre-extraction salt shuffle (n_salts=16 vs 0) in the fused path.

Hypothesis: with the fused "window" merge, the extraction stage is
key-oblivious and scan splits are byte-balanced, so the pre-extraction
salted repartition is a full content shuffle per epoch bought for nothing —
skew protection in the keyed stage is the merge shuffle's files_per_bucket
sub-salt.  Protocol as scripts/ab_files_per_bucket.py: one session, one
changelog, one warmup, configs INTERLEAVED per round so host drift cannot
split them.  Paste the JSON line into BENCH/ab_salt_shuffle.md.

Usage: python scripts/ab_salt_shuffle.py [n_events] [rounds]
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
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    salts = [16, 0]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(
        "ab_salt",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus * 2)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    workdir = tempfile.mkdtemp(prefix="ab_salt_")
    clog = os.path.join(workdir, "changelog")
    gen_parts = max(cpus, n_events // 100_000)
    log = synthetic_changelog(
        spark, n_events, seed=42, n_epochs=2, n_repos=2000, paths_per_repo=4000,
        skew=3.0, pct_update=0.35, pct_delete=0.10, num_partitions=gen_parts,
    )
    write_changelog(log, clog)

    replay(spark, clog, os.path.join(workdir, "wt"),
           ReplayConfig(n_salts=16, n_buckets=128, files_per_bucket=2))

    results: dict[int, list[float]] = {s: [] for s in salts}
    rows: dict[int, int] = {}
    for r in range(rounds):
        for s in salts:
            table = os.path.join(workdir, f"t_{s}_{r}")
            t0 = time.time()
            sink = replay(spark, clog, table,
                          ReplayConfig(n_salts=s, n_buckets=128, files_per_bucket=2))
            dt = time.time() - t0
            results[s].append(round(dt, 2))
            if r == 0:
                rows[s] = sink.load().count()
            shutil.rmtree(table, ignore_errors=True)
            print(f"  round {r} n_salts={s}: {dt:.2f}s", file=sys.stderr)

    shutil.rmtree(workdir, ignore_errors=True)
    out = {
        "n_events": n_events,
        "cpus": cpus,
        "rounds": rounds,
        "final_rows": rows,  # must be identical — salting never changes semantics
        "times_sec": {str(s): results[s] for s in salts},
        "best_sec": {str(s): min(results[s]) for s in salts},
        "median_sec": {str(s): sorted(results[s])[len(results[s]) // 2] for s in salts},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""A/B the fused merge's physical form: "window" vs "bucket_agg".

Both run the identical single bucket exchange and an identical sort
(max_by plans as SortAggregate — see sink._merge_bucket_agg docstring);
the difference is WindowExec (row_number + frame-max materialized over
every row, then filtered) vs a streaming SortAggregate group-merge that
emits only winners.  Protocol as scripts/ab_salt_shuffle.py: one session,
one changelog, one warmup, INTERLEAVED rounds.  Paste the JSON line into
BENCH/ab_merge_strategy.md.

Usage: python scripts/ab_merge_strategy.py [n_events] [rounds]
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
    strategies = ["window", "bucket_agg"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(
        "ab_merge",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus * 2)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    workdir = tempfile.mkdtemp(prefix="ab_merge_")
    clog = os.path.join(workdir, "changelog")
    gen_parts = max(cpus, n_events // 100_000)
    log = synthetic_changelog(
        spark, n_events, seed=42, n_epochs=2, n_repos=2000, paths_per_repo=4000,
        skew=3.0, pct_update=0.35, pct_delete=0.10, num_partitions=gen_parts,
    )
    write_changelog(log, clog)

    def cfg(strategy: str) -> ReplayConfig:
        return ReplayConfig(
            n_salts=0, n_buckets=128, files_per_bucket=2, merge_strategy=strategy
        )

    replay(spark, clog, os.path.join(workdir, "wt"), cfg("window"))

    results: dict[str, list[float]] = {s: [] for s in strategies}
    rows: dict[str, int] = {}
    for r in range(rounds):
        for s in strategies:
            table = os.path.join(workdir, f"t_{s}_{r}")
            t0 = time.time()
            sink = replay(spark, clog, table, cfg(s))
            dt = time.time() - t0
            results[s].append(round(dt, 2))
            if r == 0:
                rows[s] = sink.load().count()
            shutil.rmtree(table, ignore_errors=True)
            print(f"  round {r} {s}: {dt:.2f}s", file=sys.stderr)

    shutil.rmtree(workdir, ignore_errors=True)
    out = {
        "n_events": n_events,
        "cpus": cpus,
        "rounds": rounds,
        "final_rows": rows,  # must be identical (property-tested too)
        "times_sec": results,
        "best_sec": {s: min(results[s]) for s in strategies},
        "median_sec": {s: sorted(results[s])[len(results[s]) // 2] for s in strategies},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

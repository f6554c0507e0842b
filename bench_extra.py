#!/usr/bin/env python3
"""Per-query profiling harness for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen.  This script isolates each
declared query with the noop sink, records wall seconds (best of reps),
Spark job counts (per-query job groups), and optionally dumps
``.explain("formatted")`` to plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--queries a,b,c] [--reps 2] [--plans TAG] \
      [--out /tmp/prof.json]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jurisprudencia_privada_etl_spark.queries import QUERIES  # noqa: E402
from jurisprudencia_privada_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma list; default all")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dump plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus * 2)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = list(QUERIES) if not args.queries else args.queries.split(",")
    plandir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    if args.plans:
        os.makedirs(plandir, exist_ok=True)

    # one warmup query to amortize JVM/py-worker startup out of the numbers
    warm = QUERIES[names[0]](spark, sf_dir)
    warm.write.mode("overwrite").format("noop").save()

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        jobs0 = 0
        for r in range(args.reps):
            group = f"prof_{name}_{r}"
            sc.setJobGroup(group, f"profile:{name}#{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            times.append(round(dt, 3))
            if r == 0:
                try:
                    jobs0 = len(tracker.getJobIdsForGroup(group) or [])
                except Exception:
                    jobs0 = -1
        if args.plans:
            try:
                txt = QUERIES[name](spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(plandir, f"{name}_{args.plans}.txt"), "w") as f:
                    f.write(txt)
            except Exception as e:  # noqa: BLE001
                print(f"plan dump failed for {name}: {e}", file=sys.stderr)
        results[name] = {"best": min(times), "all": times, "jobs_rep0": jobs0}
        print(f"{name:32s} best={min(times):7.3f} all={times} jobs={jobs0}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": sf_dir, "cpus": cpus, "results": results}, f, indent=1)
    total = sum(v["best"] for v in results.values())
    print(json.dumps({"n": len(results), "sum_best_sec": round(total, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B: static files_per_bucket=2 (benched config) vs adaptive
per-bucket sizing (target_file_bytes) on the 1M-event headline replay.

Order-alternating rounds (A,B / B,A) in fresh JVMs bound host drift the same
way the other ab_* scripts do.  The question: does driver-side per-bucket
sizing (one os.stat walk + a broadcast map per epoch) cost measurable wall
against the static sub-split at sandbox scale, and does it even out the
write-task tail?  At 100 TB the adaptive policy is the right default — hot
Zipf buckets land files at target size instead of 1 task carrying a whole
repo — but the benched config stays whatever THIS measurement favors.

Usage: python scripts/ab_adaptive_sizing.py [n_events] [rounds]
Appends a markdown table to BENCH/ab_adaptive_sizing.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import json, time, sys
sys.path.insert(0, {repo!r})
from jurisprudencia_privada_etl_spark.session import get_spark
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay
from jurisprudencia_privada_etl_spark.sources.changelog import write_changelog
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog

spark = get_spark("ab_adaptive", master="local[32]",
                  extra_conf={{"spark.sql.shuffle.partitions": "32"}})
if {generate}:
    log = synthetic_changelog(spark, {n_events}, n_epochs=2, n_repos=400,
                              paths_per_repo=4000, skew=3.0, pct_update=0.35,
                              pct_delete=0.10, num_partitions=64)
    write_changelog(log, {wd!r} + "/clog")

cfgs = {{
    "static_f2": ReplayConfig(n_buckets=128, files_per_bucket=2),
    "adaptive": ReplayConfig(n_buckets=128, target_file_bytes={target_bytes}),
}}
cfg = cfgs[{variant!r}]
import shutil
table = {wd!r} + "/table_" + {variant!r} + "_" + str({rnd})
shutil.rmtree(table, ignore_errors=True)
t0 = time.time()
replay(spark, {wd!r} + "/clog", table, cfg)
dt = time.time() - t0
import glob
n_files = len(glob.glob(table + "/data/**/*.parquet", recursive=True))
print("RESULT " + json.dumps({{"sec": round(dt, 2), "files": n_files}}))
spark.stop()
"""


def run(variant: str, rnd: int, wd: str, n_events: int, generate: bool) -> dict:
    code = RUNNER.format(
        repo=REPO, wd=wd, n_events=n_events, variant=variant, rnd=rnd,
        generate="True" if generate else "False",
        target_bytes=8 * 1024 * 1024,
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wd = tempfile.mkdtemp(prefix="ab_adaptive_")
    results: dict[str, list[dict]] = {"static_f2": [], "adaptive": []}
    first = True
    for rnd in range(rounds):
        order = ["static_f2", "adaptive"] if rnd % 2 == 0 else ["adaptive", "static_f2"]
        for v in order:
            r = run(v, rnd, wd, n_events, generate=first)
            first = False
            results[v].append(r)
            print(f"round {rnd} {v}: {r}", flush=True)

    md = os.path.join(REPO, "BENCH", "ab_adaptive_sizing.md")
    new_file = not os.path.exists(md)
    with open(md, "a") as f:
        if new_file:
            f.write(
                "# A/B: static files_per_bucket=2 vs adaptive "
                "target_file_bytes=8MB\n\n"
                f"1M-event replay (n_buckets=128, 2 epochs, local[32]); "
                "order-alternating rounds, fresh JVM each run.\n\n"
                "| round | static_f2 sec | adaptive sec | static files | "
                "adaptive files |\n|---|---|---|---|---|\n"
            )
        for i in range(rounds):
            f.write(
                f"| {i} | {results['static_f2'][i]['sec']} | "
                f"{results['adaptive'][i]['sec']} | "
                f"{results['static_f2'][i]['files']} | "
                f"{results['adaptive'][i]['files']} |\n"
            )
    print(f"appended {md}")
    import shutil

    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""A/B the shuffle/IO compression codec (lz4 default vs zstd) on the replay.

Why this knob: the replay's one large exchange (the fused LWW+upsert merge
shuffle) carries the full ``content`` payload, and BENCH/BASELINE.md measures
this host's memory system scaling at only ~0.51 from 8 to 32 threads — the
32-thread level is bandwidth-starved while CPU-rich.  zstd moves fewer bytes
per shuffled row at more CPU per byte, so it could help exactly where the
scaling hurts.  The decision rule is per-level HONEST best: adopt zstd only
if it improves local[32] WITHOUT regressing local[8] — a codec that merely
slows the 8-thread level would inflate the efficiency ratio artificially,
which is gaming, not engineering.

``spark.io.compression.codec`` is fixed at JVM start, so each (codec, level)
cell runs in a FRESH taskset-pinned JVM against the same pre-generated
changelog; codecs are interleaved within each round so host drift cannot
split them (same protocol as scripts/bench_scaling.py).

Usage: python scripts/ab_shuffle_codec.py [n_events] [rounds] [reps]
Paste the JSON line into BENCH/ab_shuffle_codec.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from jurisprudencia_privada_etl_spark.session import get_spark
from jurisprudencia_privada_etl_spark.sources.changelog import write_changelog
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog
spark = get_spark("gen", master="local[32]",
                  extra_conf={{"spark.sql.shuffle.partitions": "64"}})
spark.sparkContext.setLogLevel("ERROR")
n = {n_events}
log = synthetic_changelog(spark, n, seed=42, n_epochs=2, n_repos=2000,
                          paths_per_repo=4000, skew=3.0, pct_update=0.35,
                          pct_delete=0.10, num_partitions=max(32, n // 100_000))
write_changelog(log, {clog!r})
spark.stop()
"""

RUNNER = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from jurisprudencia_privada_etl_spark.session import get_spark
from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay
import os
shm = "/dev/shm/ab_codec_{cpus}"
os.makedirs(shm, exist_ok=True)
spark = get_spark("ab_codec", master="local[{cpus}]", extra_conf={{
    "spark.sql.shuffle.partitions": str({cpus} * 4),
    "spark.sql.adaptive.enabled": "false",
    "spark.driver.memory": "16g",
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    "spark.local.dir": shm + "/sparktmp",
    "spark.io.compression.codec": {codec!r},
}})
spark.sparkContext.setLogLevel("ERROR")
CFG = lambda: ReplayConfig(n_salts=0, n_buckets=128, files_per_bucket=2)
times, rows = [], None
# warmup (JIT, python workers, page cache) + {reps} timed replays
for r in range({reps} + 1):
    table = shm + "/t%d" % r
    shutil.rmtree(table, ignore_errors=True)
    t0 = time.time()
    sink = replay(spark, {clog!r}, table, CFG())
    dt = time.time() - t0
    if r > 0:
        times.append(round(dt, 2))
        rows = sink.load().count()
    shutil.rmtree(table, ignore_errors=True)
print("RESULT " + json.dumps({{"times": times, "rows": rows}}))
spark.stop()
# only after stop: spark.local.dir lives under shm and Spark's shutdown
# hooks still touch it
shutil.rmtree(shm, ignore_errors=True)
"""


def run_cell(codec: str, cpus: int, reps: int, clog: str) -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, codec=codec, reps=reps, clog=clog)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT: {out.stdout[-1000:]}\n{out.stderr[-1000:]}")


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    codecs = ["lz4", "zstd"]
    levels = [32, 8]

    wd = tempfile.mkdtemp(prefix="ab_codec_")
    clog = os.path.join(wd, "changelog")
    subprocess.run([sys.executable, "-c", GEN.format(repo=REPO, n_events=n_events, clog=clog)],
                   check=True)

    cells: dict[str, list[float]] = {f"{c}@{lv}": [] for c in codecs for lv in levels}
    rows: dict[str, int] = {}
    for rd in range(rounds):
        for lv in levels:
            # codecs time-adjacent within a level, ORDER ALTERNATING per
            # round: with a fixed order, monotone host drift within the
            # level window systematically lands on the later codec and
            # reads as a codec effect (observed in the first 2 rounds:
            # zstd@8 absorbed a 53→88s within-window collapse)
            order = codecs if rd % 2 == 0 else codecs[::-1]
            for c in order:
                r = run_cell(c, lv, reps, clog)
                cells[f"{c}@{lv}"] += r["times"]
                rows[f"{c}@{lv}"] = r["rows"]
                print(f"round {rd} {c}@local[{lv}]: {r['times']}", file=sys.stderr, flush=True)

    import shutil as sh
    sh.rmtree(wd, ignore_errors=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in cells.items()}
    print(json.dumps({
        "n_events": n_events, "rounds": rounds, "reps": reps,
        "final_rows": rows,  # must be identical per level — codec never changes semantics
        "times_sec": cells,
        "best_sec": {k: min(v) for k, v in cells.items()},
        "median_sec": med,
        "eff_8_to_32": {c: round(med[f"{c}@8"] / (4 * med[f"{c}@32"]), 3) for c in codecs},
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Adjacent-pairs scaling protocol — the drift-robust estimator.

The block design (scripts/bench_scaling.py) runs ALL of local[8]
(~20 min) and then ALL of local[32] (~10 min); host per-core delivery
on this shared VM drifts ~2x on exactly that timescale, so a single
drift event lands entirely inside one level and corrupts the ratio —
observed repeatedly (BENCH/BASELINE.md rounds 1-3).  This protocol
keeps BOTH pinned JVMs resident and alternates single timed runs:

    pair k:  [calib]  run@8  run@32  [calib]      (even k: 8 first)
    pair k+1:[calib]  run@32 run@8   [calib]      (odd k: 32 first)

A pair's two runs sit ~4 minutes apart instead of ~25, so drift has
to strike inside that window to bias the ratio, the A/B order
alternates to cancel monotonic drift, and the GIL-free calibration
brackets around each pair mark which pairs a drift event did hit.
Median per-pair efficiency over bracket-clean pairs is the headline.

Same input, same ReplayConfig, same pinning (taskset) as the block
harness — only the interleaving granularity changes.

Usage: python scripts/bench_scaling_pairs.py [n_events] [pairs]
Writes BENCH/scaling_pairs.json and refreshes the "## Adjacent-pairs
protocol" section of BENCH/BASELINE.md (carried across re-renders).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import RUNNER_GEN, CONFIG_TAG  # noqa: E402  (same input + config)

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from jurisprudencia_privada_etl_spark.session import get_spark
from jurisprudencia_privada_etl_spark.plans.replay import replay, ReplayConfig

cpus = {cpus}
wd = {wd!r}
import os as _os, shutil as sh
shm = "/dev/shm/pairs_%d" % cpus
_os.makedirs(shm, exist_ok=True)
CFG = lambda: ReplayConfig(n_salts=0, n_buckets=128, files_per_bucket=2)
spark = get_spark("pairs-%d" % cpus, master="local[%d]" % cpus, extra_conf={{
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    "spark.driver.memory": "16g",
    "spark.sql.shuffle.partitions": str(cpus * 4),
    "spark.sql.adaptive.enabled": "false",
    "spark.local.dir": shm + "/sparktmp",
    "spark.python.worker.faulthandler.enabled": "true",
}})
spark.sparkContext.setLogLevel("ERROR")

def run_replay(src, tag):
    table = shm + "/" + tag
    t0 = time.time()
    replay(spark, src, table, CFG())
    dt = time.time() - t0
    sh.rmtree(table, ignore_errors=True)
    return dt

# warmup: JIT + python workers + page cache (the generator and the other
# level's warmup may already have warmed the cache; one pass re-warms
# this JVM's code paths either way)
run_replay(wd + "/wclog", "warm_small")
run_replay(wd + "/clog", "warm_full")
print("READY", flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "quit":
        break
    if cmd == "run":
        dt = run_replay(wd + "/clog", "timed")
        print("T %.3f" % dt, flush=True)
spark.stop()
sh.rmtree(shm, ignore_errors=True)
"""


def calibrate(nprocs: int = 32, sec: float = 3.0) -> float:
    import multiprocessing as mp

    def burn(q):
        end = time.time() + sec
        x = 0
        while time.time() < end:
            for _ in range(10000):
                x += 1
        q.put(x)

    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(nprocs)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return round(sum(q.get() for _ in ps) / sec / 1e6, 1)


class Worker:
    def __init__(self, cpus: int, wd: str):
        self.cpus = cpus
        code = WORKER.format(repo=REPO, cpus=cpus, wd=wd)
        self.proc = subprocess.Popen(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1,
        )

    def _read_until(self, prefix: str) -> str:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker local[{self.cpus}] died")
            if line.startswith(prefix):
                return line.strip()

    def wait_ready(self) -> None:
        self._read_until("READY")

    def run(self) -> float:
        self.proc.stdin.write("run\n")
        return float(self._read_until("T ").split()[1])

    def quit(self) -> None:
        try:
            self.proc.stdin.write("quit\n")
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    wd = tempfile.mkdtemp(prefix="bench_pairs_")
    subprocess.run(
        [sys.executable, "-c", RUNNER_GEN.format(repo=REPO, n_events=n_events, wd=wd)],
        check=True,
    )
    # warm sequentially: the 8-worker's full-replay warmup must not contend
    # with the 32-worker's
    w8 = Worker(8, wd)
    w8.wait_ready()
    w32 = Worker(32, wd)
    w32.wait_ready()
    pairs = []
    try:
        for k in range(n_pairs):
            c0 = calibrate()
            if k % 2 == 0:
                t8 = w8.run()
                t32 = w32.run()
                order = "8,32"
            else:
                t32 = w32.run()
                t8 = w8.run()
                order = "32,8"
            c1 = calibrate()
            pair = {
                "t8": round(t8, 2), "t32": round(t32, 2), "order": order,
                "eff": round(t8 / (4 * t32), 3),
                "calib_before": c0, "calib_after": c1,
                "bracket_spread": round(abs(c1 - c0) / max(c1, c0), 3),
            }
            pairs.append(pair)
            print(f"pair {k}: {pair}", flush=True)
    finally:
        w8.quit()
        w32.quit()
        import shutil

        shutil.rmtree(wd, ignore_errors=True)
    # a pair is clean when the brackets around it agree: a drift event
    # inside the pair window moves the burn rate too
    clean = [p for p in pairs if p["bracket_spread"] <= 0.15]
    med = sorted(p["eff"] for p in (clean or pairs))[len(clean or pairs) // 2]
    out = {
        "n_events": n_events, "config": CONFIG_TAG, "pairs": pairs,
        "clean_pairs": len(clean), "median_eff_clean": med,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_pairs.json"), "w") as f:
        json.dump(out, f, indent=1)
    _patch_baseline(out)
    print(json.dumps(out))


def _patch_baseline(out: dict) -> None:
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "## Adjacent-pairs protocol"
    rows = "\n".join(
        f"| {i} | {p['order']} | {p['t8']}s | {p['t32']}s | {p['eff']} "
        f"| {p['calib_before']}/{p['calib_after']}M ({p['bracket_spread']:.0%}) "
        f"| {'clean' if p['bracket_spread'] <= 0.15 else 'drift-hit'} |"
        for i, p in enumerate(out["pairs"])
    )
    section = f"""{marker}

The block design above is vulnerable to host drift striking inside one
level's ~20-minute window (rounds 1-3).  This protocol keeps both
pinned JVMs resident and alternates SINGLE timed runs — the two runs
of a pair sit ~4 minutes apart, the 8/32 order alternates to cancel
monotonic drift, and all-core calibration burns bracket each pair.
Same input ({out['n_events']:,} events), same config ({out['config']}).

| pair | order | local[8] | local[32] | raw eff | brackets | verdict |
|---|---|---|---|---|---|---|
{rows}

**Median raw efficiency over bracket-clean pairs: {out['median_eff_clean']:.2f}**
({out['clean_pairs']}/{len(out['pairs'])} pairs clean at <=15% bracket spread).
"""
    with open(md) as f:
        old = f.read()
    if marker in old:
        pre, rest = old.split(marker, 1)
        nxt = rest.find("\n## ")
        old = pre + (rest[nxt + 1:] if nxt >= 0 else "")
        new = old.rstrip() + "\n\n" + section
    else:
        new = old.rstrip() + "\n\n" + section
    with open(md, "w") as f:
        f.write(new)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Memory-bandwidth probe (STREAM-triad style) — the host-quality gate the
round-5 verdict asked for (VERDICT r05, Next round #1a).

The GIL-free CPU burn in bench.py/bench_scaling.py cannot see MEMORY-
BANDWIDTH theft by a co-tenant (cluster_scaling_trust.md proves burst
rounds pass CPU brackets while 4x8 replicates ramp 3x).  This probe runs
an out-of-cache numpy triad ``a[:] = b + s*c`` in N concurrent processes
(preallocated buffers, one C loop per rep — pure load/store traffic) and
reports aggregate GB/s.  Use it immediately before AND between timed
replicates; gate each replicate, not each round.

Usage: python scripts/probe_bandwidth.py [--procs 8] [--mb 512] [--reps 5]
Prints one JSON line: {"gbps": ..., "per_proc": [...], "procs": N}

Calibration on this sandbox (quiet windows): aggregate ~8 procs x 512 MB
saturates the socket; record the clean-window reading next to
BENCH/cluster_scaling.md and gate replicates at >= ~80% of it.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def triad(mb: int, reps: int, q) -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8 // 3  # three float64 buffers totalling ~mb MB
    a = np.zeros(n)
    b = np.ones(n)
    c = np.full(n, 2.0)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.add(b, 1.5 * c, out=a)  # 1 mul-temp + triad: ~4 arrays touched
        dt = time.perf_counter() - t0
        gbps = 4 * 8 * n / dt / 1e9
        best = max(best, gbps)
    q.put(round(best, 2))


def measure(procs: int, mb: int, reps: int) -> dict:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=triad, args=(mb, reps, q)) for _ in range(procs)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    per = sorted((q.get() for _ in ps), reverse=True)
    return {"gbps": round(sum(per), 1), "per_proc": per, "procs": procs}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=8)
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(json.dumps(measure(args.procs, args.mb, args.reps)))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Host memory-bandwidth scaling probe (context for BENCH/BASELINE.md).

The token pipeline scales 0.91 at 2.5M docs but ~0.6 at 8M docs (4 -> 16
cores). A pure-compute probe on this box scales ~1.0 to 16 workers, so the
8M ceiling is not CPU contention. This probe measures the other shared
resource: aggregate memory bandwidth at 1/4/16 concurrent workers, each
streaming over a buffer far larger than L3 (numpy float64 adds — a
STREAM-triad-like access pattern).

If aggregate GB/s stops growing between 4 and 16 workers, a shuffle/sort
heavy Spark job whose working set exceeds cache is bandwidth-bound at 16
local threads — a single-box artifact: on a real cluster 4x executors
bring 4x memory channels, so the local[4] vs local[16] proxy UNDERSTATES
true N-vs-4N scaling for bandwidth-bound inputs.

Usage: python scripts/membw_probe.py [--mb 512] [--reps 6]
Writes BENCH/membw.json; prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(mb: int, reps: int, q) -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.empty(n)
    # warm-up touch
    np.add(a, b, out=c)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.add(a, b, out=c)  # 3 x buffer bytes of traffic per rep (triad-ish)
    dt = time.perf_counter() - t0
    q.put(3 * mb * reps / 1024 / dt)  # GB/s for this worker


def measure(workers: int, mb: int, reps: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(mb, reps, q)) for _ in range(workers)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 2)  # aggregate GB/s


def main() -> None:
    args = sys.argv[1:]
    mb = int(args[args.index("--mb") + 1]) if "--mb" in args else 512
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 6
    out = {}
    for w in (1, 4, 16):
        out[f"workers_{w}"] = max(measure(w, mb, reps) for _ in range(3))
    eff_4_16 = round(out["workers_16"] / out["workers_4"] / 4, 3)
    summary = {
        "metric": "memory_bandwidth_scaling",
        "buffer_mb_per_worker": mb,
        "aggregate_gbps": out,
        "bw_scaling_4_to_16": round(out["workers_16"] / out["workers_4"], 3),
        "bw_efficiency_4_to_16": eff_4_16,
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/membw.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""Memory-bandwidth probe (STREAM-like): aggregate GB/s at a given process
count. The sandbox VM's deliverable bandwidth peaks around 8 processes and
*degrades* beyond — the hard ceiling on any shuffle/scan workload's 8->32
scaling, independent of engine design. bench.py records this next to the
measured throughput so the scaling efficiency can be read against what the
hardware actually offers (BENCH.md)."""

from __future__ import annotations

import sys
import time
from multiprocessing import Pool

import numpy as np

ARR = 30_000_000  # 240 MB per process


def _stream(n_iters: int) -> float:
    a = np.ones(ARR, dtype=np.float64)
    s = 0.0
    for _ in range(n_iters):
        b = a * 1.0001
        s += float(b[0])
    return s


def measure(procs: int, iters: int = 3, repeats: int = 3) -> float:
    """Best-of-N aggregate GB/s moved (read+write) across `procs` workers."""
    best = 0.0
    for _ in range(repeats):
        t0 = time.time()
        with Pool(procs) as p:
            p.map(_stream, [iters] * procs)
        dt = time.time() - t0
        gb = procs * iters * (ARR * 8 * 2) / 1e9
        best = max(best, gb / dt)
    return round(best, 1)


if __name__ == "__main__":
    for procs in [int(x) for x in (sys.argv[1:] or ["8", "32"])]:
        print(procs, "procs:", measure(procs), "GB/s")

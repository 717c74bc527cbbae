#!/usr/bin/env python
"""Machine memory-bandwidth ceiling probe.

Runs K independent processes each streaming over a private 512 MB numpy
array (read-sum — the cheapest memory-bound kernel) and reports
aggregate GB/s at each K. If aggregate bandwidth stops growing with K,
single-box thread-scaling of memory-bound Spark stages is capped by the
memory bus, NOT by the engine — on a real cluster every 4N-executor step
adds memory channels/NICs/disks in proportion, which a single box cannot
emulate. Evidence companion to BENCH/BASELINE.md.

Usage: python BENCH/membw_probe.py [K1,K2,...]
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np

MB = 512


def worker(out, i):
    a = np.ones(MB * 1024 * 1024 // 8, dtype=np.float64)
    a.sum()  # fault in
    t0 = time.monotonic()
    reps = 8
    for _ in range(reps):
        a.sum()
    dt = time.monotonic() - t0
    out.put(reps * MB / 1024 / dt)  # GB/s for this worker


def run(k: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, i)) for i in range(k)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


if __name__ == "__main__":
    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,8,32").split(",")]
    base = None
    for k in ks:
        bw = run(k)
        base = base or bw / k
        print({"procs": k, "aggregate_GBps": round(bw, 1),
               "per_proc_GBps": round(bw / k, 2),
               "scaling_vs_1proc": round(bw / (base * k), 2)})

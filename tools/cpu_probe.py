#!/usr/bin/env python3
"""Hypervisor-steal probe: times a fixed CPU-bound workload single-thread
and across 32 processes. Campaign protocol (SURVEY round-6 note): only
trust cross-engine timing campaigns bracketed by fast-window probes —
historically ~0.6 s single / ~0.9 s 32-proc on this box; a slow window
reads 2-3.5x that on identical code.

Usage: python3 tools/cpu_probe.py  ->  "single=0.62s par32=0.89s"
"""
import time
from concurrent.futures import ProcessPoolExecutor

N = 10_000_000


def burn(_=None):
    s = 0
    for i in range(N):
        s += i * i
    return s


if __name__ == "__main__":
    t0 = time.perf_counter()
    burn()
    single = time.perf_counter() - t0
    with ProcessPoolExecutor(32) as ex:
        t0 = time.perf_counter()
        list(ex.map(burn, range(32)))
        par = time.perf_counter() - t0
    print(f"single={single:.2f}s par32={par:.2f}s")

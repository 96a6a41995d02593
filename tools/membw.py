"""STREAM-like host memory-bandwidth probe (Spark-independent).

Evidence tool for BENCH/BASELINE.md: on a single box, all local[N]
"executors" share one memory-bandwidth domain.  This measures the
aggregate attainable bandwidth at several process counts — the ceiling
any bandwidth-bound stage (shuffle, cache fill, Arrow IPC, parquet
encode) can scale to, independent of how the job is written.

The kernel is a two-pass scale+add (numpy cannot fuse a true one-pass
STREAM triad): multiply(b,2,out=c) streams 2 arrays (read b, write c)
and c+=a streams 3 (read c, read a, write c) -> 5 x 8 bytes/element
per rep.  Absolute GB/s use that factor; the 8->32 SCALING RATIO (what
BASELINE.md's ceiling argument uses) is factor-independent.

Usage: python tools/membw.py [total_elems]
"""

from __future__ import annotations

import json
import sys
import time
from multiprocessing import Pool

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000  # 1.6 GB of f64


def _work(args):
    n, reps = args
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    c[:] = 0.0  # first-touch before timing
    t0 = time.time()
    for _ in range(reps):
        np.multiply(b, 2.0, out=c)  # 2 streams: read b, write c
        c += a                      # 3 streams: read c, read a, write c
    dt = time.time() - t0
    return (n * 8 * 5 * reps) / dt  # bytes touched per second


def run(nthreads: int, reps: int = 4) -> float:
    n = N // nthreads
    with Pool(nthreads) as p:
        bws = p.map(_work, [(n, reps)] * nthreads)
    return sum(bws) / 1e9


if __name__ == "__main__":
    out = {nt: round(run(nt), 1) for nt in (1, 4, 8, 16, 32)}
    print(json.dumps({"aggregate_GBps_by_nproc": out}))

"""Host memory-subsystem scaling ceiling — the non-Spark control.

The scaling harness measures Spark phases at pinned local[4] vs local[16].
Shuffle- and IPC-bound phases cannot scale past the HOST's aggregate memory
bandwidth, which is shared by all cores — this probe measures that ceiling
directly with the same primitives the engine's kernels use (numpy gather +
bincount over arrays far larger than LLC), with NO Spark, NO JVM, NO IPC:
pure per-process compute, embarrassingly parallel. Whatever efficiency this
reports from 4 → 16 workers is the hardware's best case for any
memory-bound phase; Spark phases landing near it are at the host ceiling,
not leaving framework performance on the table.

Usage: python BENCH/membw.py   → one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N = 20_000_000      # elements per worker: 160 MB of int64 + 160 MB float64
ROUNDS = 5


def worker(cpu: int, out_q) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    rng = np.random.default_rng(cpu)
    idx = rng.integers(0, N, N)              # random gather pattern
    w = rng.random(N)
    # warm-up
    np.bincount(idx, weights=w, minlength=N)
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        np.bincount(idx, weights=w, minlength=N)  # gather+scatter, DRAM-bound
    dt = time.perf_counter() - t0
    out_q.put((cpu, ROUNDS * N / dt))        # elements/sec for this worker


def run(n_workers: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=worker, args=(i, q)) for i in range(n_workers)]
    for p in procs:
        p.start()
    rates = [q.get()[1] for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    lo, hi = 4, 16
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_hi / r_lo) / (hi / lo)
    print(json.dumps({
        "primitive": "np.bincount(idx, weights) over 320MB/worker (DRAM-bound gather+scatter)",
        "workers_lo": lo, "workers_hi": hi,
        "elems_per_sec_lo": round(r_lo), "elems_per_sec_hi": round(r_hi),
        "speedup": round(r_hi / r_lo, 2),
        "scaling_efficiency": round(eff, 2),
    }))


if __name__ == "__main__":
    main()

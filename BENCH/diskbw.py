"""Host disk-bandwidth scaling control — the second non-Spark control.

Shuffle-heavy phases write (and cache-spill) tens of GB to the single local
disk that all cores share. This probe measures aggregate sequential write
throughput at 4 vs 16 concurrent pinned writers: if the total is flat, the
disk is a shared ceiling for shuffle/spill-bound phases on ONE host —
a resource that a real multi-executor cluster multiplies with every
executor (each brings its own shuffle disks), unlike this proxy.

Usage: python BENCH/diskbw.py [dir]   → one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

CHUNK = 64 * 1024 * 1024      # 64 MB writes
CHUNKS = 16                   # 1 GB per worker


def worker(cpu: int, base: str, out_q) -> None:
    os.sched_setaffinity(0, {cpu})
    buf = os.urandom(CHUNK)
    path = os.path.join(base, f"dbw_{cpu}.bin")
    t0 = time.perf_counter()
    with open(path, "wb") as f:
        for _ in range(CHUNKS):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    dt = time.perf_counter() - t0
    os.unlink(path)
    out_q.put(CHUNK * CHUNKS / dt)


def run(n_workers: int, base: str) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=worker, args=(i, base, q)) for i in range(n_workers)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    lo, hi = 4, 16
    r_lo = run(lo, base)
    r_hi = run(hi, base)
    eff = (r_hi / r_lo) / (hi / lo)
    print(json.dumps({
        "primitive": "1GB sequential write + fsync per worker",
        "dir": base,
        "workers_lo": lo, "workers_hi": hi,
        "mb_per_sec_lo": round(r_lo / 1e6), "mb_per_sec_hi": round(r_hi / 1e6),
        "speedup": round(r_hi / r_lo, 2),
        "scaling_efficiency": round(eff, 2),
    }))


if __name__ == "__main__":
    main()

"""Two-cluster-size scaling evidence (the north rule's ≥0.8 efficiency
criterion; sandbox proxy: the identical job at two parallelism levels).

Method (written up in BENCH/BASELINE.md):

- The workload — triangle count (Arrow batch kernel) and 3 PageRank
  iterations over a relabeled synthetic Common-Crawl-style link graph — is
  materialized ONCE to parquet, then run in two fresh Spark JVMs.
- Each JVM is CPU-PINNED (``sched_setaffinity``) to N and 4N cores — the
  honest stand-in for an N-executor vs 4N-executor cluster (an unpinned
  local[N] JVM leaks GC/shuffle/Python-worker threads onto all host
  cores, silently inflating the small configuration).
- This host advertises 32 CPUs but scales linearly only to ~16 (measured
  with pure cache-resident numpy: 1→16 workers ≈ linear, 16→32 flat — an
  overcommitted hypervisor). The pair (4, 16) therefore sits entirely in
  the machine's linear region; (8, 32) would measure the hypervisor, not
  the engine.
- One warm-up run per JVM (JIT + whole-stage-codegen + Python worker pool
  spin-up — one-time costs a long-lived cluster amortizes), then median of
  3 timed runs.
- Identical shuffle partitioning (32) at both sizes, so the plans are
  identical and only the core count varies.

Usage:  python BENCH/scaling.py [n_pages]   (default 800000)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGES_PATH = "/tmp/gsi_scaling_edges"
LO, HI = 4, 16
SHUFFLE_PARTITIONS = 32
PR_ITERS = 3
REPEATS = 3

GEN = r"""
import sys, os
sys.path.insert(0, %(repo)r)
os.environ['SPARK_DRIVER_MEM'] = '48g'
from graphsetintersection_spark.session import get_spark
from graphsetintersection_spark.sources.pages import generate_pages
from graphsetintersection_spark.sources.extract import link_edges
from graphsetintersection_spark.operators.relabel import degree_order, apply_order
spark = get_spark(app_name="gsi-scaling-gen")
n_pages = int(sys.argv[1])
pages = generate_pages(spark, n_pages, avg_links=12.0, seed=42)
e = link_edges(pages)
relabeled = apply_order(e, degree_order(e))
relabeled.repartition(64, "src").write.mode("overwrite").parquet(%(edges)r)
print("GENERATED")
spark.stop()
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cores = int(sys.argv[1])
os.sched_setaffinity(0, set(range(cores)))   # pin BEFORE the JVM starts
os.environ['SPARK_DRIVER_MEM'] = '48g'
from graphsetintersection_spark.session import get_spark
from pyspark.sql import functions as F
from graphsetintersection_spark.operators.triangle import triangle_count_kernel
from graphsetintersection_spark.operators.pagerank import pagerank

spark = get_spark(app_name=f"gsi-scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=%(sp)d)
edges = spark.read.parquet(%(edges)r).persist()
n_edges = edges.count()

tri = triangle_count_kernel(edges)           # warm-up (JIT, worker pool)
pagerank(edges, max_iter=1, tol=None)

tc, pr = [], []
for _ in range(%(repeats)d):
    t0 = time.perf_counter(); t = triangle_count_kernel(edges)
    tc.append(time.perf_counter() - t0)
    assert t == tri
    t0 = time.perf_counter(); pagerank(edges, max_iter=%(pr_iters)d, tol=None)
    pr.append(time.perf_counter() - t0)

print(json.dumps({"cores": cores, "n_edges": n_edges, "triangles": tri,
                  "tc_secs": [round(x,2) for x in tc],
                  "pr_secs": [round(x,2) for x in pr]}))
spark.stop()
"""


def run_py(code: str, *args: str, timeout: int = 3600) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return out.stdout


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    subst = {"repo": REPO, "edges": EDGES_PATH, "sp": SHUFFLE_PARTITIONS,
             "repeats": REPEATS, "pr_iters": PR_ITERS}
    if not os.path.exists(os.path.join(EDGES_PATH, "_SUCCESS")):
        run_py(GEN % subst, str(n_pages))
    results = {}
    for cores in (LO, HI):
        line = [
            l for l in run_py(WORKER % subst, str(cores)).splitlines()
            if l.startswith("{")
        ][-1]
        results[cores] = json.loads(line)

    r_lo, r_hi = results[LO], results[HI]
    n_edges = r_lo["n_edges"]
    med = statistics.median
    tc_lo, tc_hi = med(r_lo["tc_secs"]), med(r_hi["tc_secs"])
    pr_lo, pr_hi = med(r_lo["pr_secs"]), med(r_hi["pr_secs"])
    tc_eps = (n_edges / tc_lo, n_edges / tc_hi)
    pr_eps = (n_edges * PR_ITERS / pr_lo, n_edges * PR_ITERS / pr_hi)
    scale = HI / LO
    eff_tc = (tc_eps[1] / tc_eps[0]) / scale
    eff_pr = (pr_eps[1] / pr_eps[0]) / scale

    md = f"""# BENCH/BASELINE — throughput + scaling evidence

North-rule metric: triangle-count + PageRank-iteration throughput
(edges/sec) over the Common-Crawl-style link corpus, and ≥0.8 throughput
scaling efficiency from N to 4N executors. Sandbox proxy: the identical
job in two fresh, CPU-PINNED Spark JVMs at local[{LO}] and local[{HI}]
(this host scales linearly only to ~16 of its 32 advertised CPUs —
measured with cache-resident numpy — so ({LO},{HI}) is the largest 4×
pair inside the linear region; pinning via sched_setaffinity keeps the
small JVM from leaking GC/IPC threads onto unused cores).

Workload: {r_lo["n_edges"]:,} relabeled edges extracted from a
{n_pages:,}-page synthetic corpus (Zipf hubs); triangle count = Arrow
batch-kernel form; PageRank = {PR_ITERS} iterations (damping + dangling).
One warm-up per JVM, median of {REPEATS} timed runs, identical
{SHUFFLE_PARTITIONS}-partition shuffles at both sizes.

| metric | local[{LO}] | local[{HI}] | speedup | scaling efficiency |
|---|---|---|---|---|
| triangle-count edges/sec | {tc_eps[0]:,.0f} | {tc_eps[1]:,.0f} | {tc_eps[1] / tc_eps[0]:.2f}× | **{eff_tc:.2f}** |
| PageRank edges/sec/iter | {pr_eps[0]:,.0f} | {pr_eps[1]:,.0f} | {pr_eps[1] / pr_eps[0]:.2f}× | **{eff_pr:.2f}** |

Triangle count = {r_lo["triangles"]:,} — equal at both parallelism levels:
{r_lo["triangles"] == r_hi["triangles"]} (the correctness invariant under
repartitioning).

Efficiency = (throughput_hi / throughput_lo) / ({HI}/{LO}). Single-host
caveat: both JVMs share one memory subsystem, so shuffle-heavy phases are
bandwidth-coupled — on a real multi-executor cluster each executor brings
its own memory channels and local shuffle disks, making these numbers a
conservative lower bound.

Raw: {json.dumps(r_lo)}
     {json.dumps(r_hi)}
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

"""Maximal clique enumeration — the reference's ``mc`` binary.

Semantics (src/org_maximal_clique.cpp, src/bitpack_maximal_clique.cpp):
enumerate ALL maximal cliques of the undirected simple graph. The reference
ships three variants (plain Bron–Kerbosch :50-73, BK+Tomita pivot :169-314,
BK+degeneracy outer order :75-131); all share the P/X set-intersection
inner loop built on the set kernels.

Spark decomposition (the reference's outer degeneracy loop is
embarrassingly parallel, which is exactly what we exploit):

1. an ordering rank r(v) — degeneracy order when the vertex count permits
   computing it (driver-side bucket peeling over collected degrees, the
   same bucket-queue algorithm as src/org_maximal_clique.cpp:316-370),
   else degree order (same family, scalable);
2. per-vertex subproblems: for each v, ship the adjacency lists of all
   u ∈ N(v) into v's group (one join, one shuffle — the same data motion
   as the triangle join);
3. ``applyInPandas`` kernel: restrict each neighbor list to N(v)
   (np.intersect1d — the engine's core kernel), split into
   P = {u : r(u) > r(v)} and X = {u : r(u) < r(v)}, run BK+pivot in numpy.
   Every maximal clique is emitted exactly once — by its minimum-rank
   member (the BK-degeneracy guarantee).

Output: DataFrame[clique: array<long>] (sorted members), matching the
reference's answer dump (src/org_maximal_clique.cpp:372-385).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsetintersection_spark.operators.adjacency import adjacency
from graphsetintersection_spark.operators.edges import canonicalize, symmetrize


def degeneracy_order(edges: DataFrame, max_driver_vertices: int = 2_000_000):
    """(order DataFrame[v, rank], degeneracy) — min-degree-first peeling.

    Reference: bucket-queue peeling (src/org_maximal_clique.cpp:316-370).
    The peeling loop is sequential by nature; degrees are collected and
    peeled driver-side in O(V+E) over numpy CSR (fine up to ~10^6-10^7
    vertices — beyond that callers fall back to degree order, the scalable
    member of the same ordering family)."""
    und = symmetrize(canonicalize(edges))
    adj_rows = adjacency(und).collect()
    if len(adj_rows) > max_driver_vertices:
        raise ValueError("graph too large for driver-side degeneracy order")
    ids = np.array([r["v"] for r in adj_rows], dtype=np.int64)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    nbrs = [np.array([idx_of[int(u)] for u in r["nbrs"]], dtype=np.int64)
            for r in adj_rows]
    n = len(ids)
    deg = np.array([len(x) for x in nbrs], dtype=np.int64)
    removed = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    degeneracy = 0
    # bucket queue over degrees
    buckets: dict[int, set[int]] = {}
    for i in range(n):
        buckets.setdefault(int(deg[i]), set()).add(i)
    cur = 0
    for pos in range(n):
        while cur not in buckets or not buckets[cur]:
            cur += 1
            if cur > n:  # pragma: no cover
                break
        i = min(buckets[cur])  # deterministic tie-break
        buckets[cur].discard(i)
        degeneracy = max(degeneracy, cur)
        removed[i] = True
        order[pos] = i
        for j in nbrs[i]:
            if not removed[j]:
                d = int(deg[j])
                buckets[d].discard(int(j))
                deg[j] = d - 1
                buckets.setdefault(d - 1, set()).add(int(j))
        cur = max(cur - 1, 0)
    spark = edges.sparkSession
    rank_rows = [(int(ids[i]), int(r)) for r, i in enumerate(order)]
    return (
        spark.createDataFrame(rank_rows, "v long, rank long"),
        int(degeneracy),
    )


def _bk_pivot(cand: set, excl: set, clique: list, adj: dict, out: list) -> None:
    """Bron–Kerbosch with Tomita pivot (reference
    src/org_maximal_clique.cpp:169-314): recurse only over P \\ N(pivot)."""
    if not cand and not excl:
        out.append(sorted(clique))
        return
    pivot = max(cand | excl, key=lambda u: len(adj[u] & cand))
    for u in sorted(cand - adj[pivot]):
        nu = adj[u]
        clique.append(u)
        _bk_pivot(cand & nu, excl & nu, clique, adj, out)
        clique.pop()
        cand.discard(u)
        excl.add(u)


def maximal_cliques(
    edges: DataFrame,
    order: DataFrame | None = None,
    min_size: int = 1,
) -> DataFrame:
    """All maximal cliques (size ≥ min_size) as DataFrame[clique:
    array<long>]. ``order`` is (v, rank); defaults to degree order."""
    und = symmetrize(canonicalize(edges))
    adj = adjacency(und)  # (v, nbrs) full undirected adjacency

    if order is None:
        from graphsetintersection_spark.operators.relabel import degree_order

        order = degree_order(und, descending=False).select(
            F.col("org_id").alias("v"), F.col("new_id").alias("rank")
        )

    adj_r = adj.join(order, "v")
    # group for vertex v: one row per neighbor u carrying u's adjacency+rank
    grouped = (
        und.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .join(
            adj_r.select(
                F.col("v").alias("u"),
                F.col("nbrs").alias("u_nbrs"),
                F.col("rank").alias("u_rank"),
            ),
            "u",
        )
        .join(order.select(F.col("v"), F.col("rank").alias("v_rank")), "v")
    )

    def bk_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(pdf["v"].iloc[0])
        v_rank = int(pdf["v_rank"].iloc[0])
        ranks = dict(zip(pdf["u"].astype(int), pdf["u_rank"].astype(int)))
        nbr_set = set(ranks)
        adj_local = {
            int(u): (set(np.asarray(nb, dtype=np.int64).tolist()) & nbr_set)
            for u, nb in zip(pdf["u"], pdf["u_nbrs"])
        }
        cand = {u for u, r in ranks.items() if r > v_rank}
        excl = {u for u, r in ranks.items() if r < v_rank}
        out: list[list[int]] = []
        _bk_pivot(cand, excl, [v], adj_local, out)
        rows = [c for c in out if len(c) >= min_size]
        return pd.DataFrame({"clique": rows}) if rows else pd.DataFrame(
            {"clique": pd.Series([], dtype=object)}
        )

    return grouped.groupBy("v").applyInPandas(bk_group, "clique array<long>")


def maximal_clique_count(edges: DataFrame, order: DataFrame | None = None) -> int:
    """mc_num — the reference's printed headline (src/mc.cpp:39-47)."""
    return maximal_cliques(edges, order).count()

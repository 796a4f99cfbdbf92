"""Maximal clique enumeration — the reference's ``mc`` binary.

Semantics (src/org_maximal_clique.cpp, src/bitpack_maximal_clique.cpp):
enumerate ALL maximal cliques of the undirected simple graph. The reference
ships three variants (plain Bron–Kerbosch :50-73, BK+Tomita pivot :169-314,
BK+degeneracy outer order :75-131); all share the P/X set-intersection
inner loop built on the set kernels.

Spark decomposition (the reference's outer degeneracy loop is
embarrassingly parallel, which is exactly what we exploit):

1. an ordering rank r(v) — distributed degeneracy order
   (``degeneracy_order_distributed``: simultaneous min-degree-stratum
   peeling, the DataFrame re-expression of the reference's bucket queue
   src/org_maximal_clique.cpp:316-370) or degree order (cheaper, same
   family); a driver-side exact peel is kept for small-graph parity.
2. per-vertex subproblems shipped as INDUCED NEIGHBORHOOD EDGES: for
   each v, rows (v, u, w) where u,w ∈ N(v) and (u,w) ∈ E — the
   triangle-join dataflow. This ships Θ(Σ_v tri(v)) rows instead of the
   naive Σ_u deg(u)² full-adjacency copies (which explodes on Zipf
   hubs — one hub's group would otherwise hold the whole graph's
   neighborhoods).
3. ``applyInPandas`` kernel: rebuild the induced adjacency per group,
   split members into P = {u : r(u) > r(v)} and X = {u : r(u) < r(v)},
   run BK+Tomita-pivot. Every maximal clique is emitted exactly once —
   by its minimum-rank member (the BK-degeneracy guarantee).

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


def degeneracy_order_distributed(
    edges: DataFrame, max_rounds: int = 10_000
) -> tuple[DataFrame, int]:
    """(order DataFrame[v, rank], degeneracy) with NO driver-side graph.

    Simultaneous min-degree-stratum peeling: each round removes every
    vertex whose current degree equals the graph's minimum — equivalent to
    some sequential min-degree peel, so max(min-degree over rounds) is the
    degeneracy and every vertex's later-ordered neighbors number ≤
    degeneracy (the bound BK-degeneracy relies on). Reference semantics:
    the bucket-queue peel of src/org_maximal_clique.cpp:316-370, re-run as
    an iterative DataFrame job (per round: one degree aggregate + two
    anti-joins, lineage truncated). Round count = number of distinct peel
    waves (tens on web-shaped graphs; worst case O(V) on paths — cap with
    ``max_rounds``, leftovers are appended in degree order).

    Final dense ranks come from the two-phase distributed assign over
    (wave, v)."""
    from graphsetintersection_spark.operators.edges import vertices
    from graphsetintersection_spark.plans.assign import global_order_stats

    und = symmetrize(canonicalize(edges))
    remaining = vertices(und).localCheckpoint(eager=True)
    cur = und.localCheckpoint(eager=True)
    waves: DataFrame | None = None
    degeneracy = 0
    wave = 0
    while wave < max_rounds:
        deg = (
            remaining.join(
                cur.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("d")),
                "v",
                "left",
            ).select("v", F.coalesce("d", F.lit(0)).alias("d"))
        ).persist()
        row = deg.agg(F.min("d").alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
        if not row["n"]:
            deg.unpersist()
            break
        dmin = int(row["m"])
        degeneracy = max(degeneracy, dmin)
        peel = deg.where(F.col("d") == dmin).select("v").localCheckpoint(eager=True)
        w_df = peel.withColumn("wave", F.lit(wave))
        waves = w_df if waves is None else waves.unionByName(w_df)
        old_remaining, old_cur = remaining, cur
        remaining = remaining.join(peel, "v", "left_anti").localCheckpoint(eager=True)
        cur = (
            cur.join(peel.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(peel.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        # previous wave's remaining/cur snapshots are superseded; the peel
        # frames stay — `waves` references every wave's rows until the end
        old_remaining.unpersist()
        old_cur.unpersist()
        deg.unpersist()
        wave += 1
    # cap hit: leftovers appended as one final wave (degree-order family)
    leftover = remaining.withColumn("wave", F.lit(wave))
    waves = leftover if waves is None else waves.unionByName(leftover)
    order = global_order_stats(
        waves, [F.col("wave").asc(), F.col("v").asc()], rank_col="rank"
    ).select("v", "rank")
    # global_order_stats materialized its own cache; drop the peel state
    remaining.unpersist()
    cur.unpersist()
    return order, degeneracy


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
    und = symmetrize(canonicalize(edges)).persist()

    if order is None:
        from graphsetintersection_spark.operators.relabel import degree_order

        order = degree_order(und, descending=False).select(
            F.col("org_id").alias("v"), F.col("new_id").alias("rank")
        )

    # member rows (v, u, null, u_rank, v_rank): N(v) with ranks
    vu = und.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    members = (
        vu.join(
            order.select(F.col("v").alias("u"), F.col("rank").alias("u_rank")),
            "u",
        )
        .join(order.select("v", F.col("rank").alias("v_rank")), "v")
        .select(
            "v", "u", F.lit(None).cast("long").alias("w"), "u_rank", "v_rank"
        )
    )
    # induced-neighborhood edge rows (v, u, w): u,w ∈ N(v), (u,w) ∈ E —
    # the triangle join (operators.triangle), so each group receives the
    # subproblem GRAPH, not a full adjacency copy per neighbor
    induced = (
        vu.join(und.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u")
        .join(
            und.select(F.col("src").alias("v"), F.col("dst").alias("w")),
            ["v", "w"],
            "left_semi",
        )
        .select(
            "v", "u", "w",
            F.lit(None).cast("long").alias("u_rank"),
            F.lit(None).cast("long").alias("v_rank"),
        )
    )
    grouped = members.unionByName(induced)

    def bk_group(pdf: pd.DataFrame) -> pd.DataFrame:
        is_member = pdf["w"].isna()
        mem = pdf[is_member]
        v = int(mem["v"].iloc[0])
        v_rank = int(mem["v_rank"].iloc[0])
        ranks = dict(zip(mem["u"].astype(int), mem["u_rank"].astype(int)))
        adj_local: dict[int, set] = {u: set() for u in ranks}
        ev = pdf[~is_member]
        for u, w in zip(ev["u"].astype(int), ev["w"].astype(int)):
            adj_local[u].add(w)
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

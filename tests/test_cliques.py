"""Maximal cliques vs an independent plain-BK Python oracle (mirrors the
reference's Org vs BP cross-checking of mc_num, src/mc.cpp:17-19)."""

import pytest

from tests.conftest import random_graph, undirected_simple

from graphsetintersection_spark.operators.cliques import (
    degeneracy_order,
    degeneracy_order_distributed,
    maximal_clique_count,
    maximal_cliques,
)


def python_bk(pairs):
    """Plain Bron–Kerbosch (no pivot, no ordering) — independent oracle."""
    und = undirected_simple(pairs)
    adj = {}
    for e in und:
        u, v = tuple(e)
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = []

    def bk(r, p, x):
        if not p and not x:
            out.append(tuple(sorted(r)))
            return
        for v in sorted(p):
            bk(r | {v}, p & adj[v], x & adj[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(adj), set())
    return sorted(out)


def _collect_cliques(df):
    return sorted(tuple(r["clique"]) for r in df.collect())


def test_cliques_tiny_exact(spark):
    pairs = random_graph(25, 90, seed=9)
    df = spark.createDataFrame(pairs, "src long, dst long")
    oracle = python_bk(pairs)
    assert len(oracle) > 3
    got = _collect_cliques(maximal_cliques(df))
    assert got == oracle


def test_cliques_with_degeneracy_order(spark):
    pairs = random_graph(30, 140, seed=4)
    df = spark.createDataFrame(pairs, "src long, dst long")
    order, degen = degeneracy_order(df)
    assert degen >= 1
    got = _collect_cliques(maximal_cliques(df, order=order))
    assert got == python_bk(pairs)


def test_clique_structures(spark):
    # K4 + attached triangle + pendant edge
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 4), (4, 5), (3, 5), (5, 6)]
    df = spark.createDataFrame(k4 + extra, "src long, dst long")
    got = _collect_cliques(maximal_cliques(df))
    assert got == [(0, 1, 2, 3), (3, 4, 5), (5, 6)]
    assert maximal_clique_count(df) == 3


def test_degeneracy_value(spark):
    # a k-core graph: K5 has degeneracy 4; adding a path keeps it 4
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(5, 6), (6, 7)]
    df = spark.createDataFrame(k5 + path, "src long, dst long")
    _, degen = degeneracy_order(df)
    assert degen == 4


def test_degeneracy_distributed_matches_driver(spark):
    pairs = random_graph(40, 180, seed=11)
    df = spark.createDataFrame(pairs, "src long, dst long")
    _, degen_driver = degeneracy_order(df)
    order, degen_dist = degeneracy_order_distributed(df)
    assert degen_dist == degen_driver
    # the order is a valid permutation of the vertex set
    rows = order.collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(len(rows)))
    # and BK over it reproduces the exact clique set
    got = _collect_cliques(maximal_cliques(df, order=order))
    assert got == python_bk(pairs)


def test_degeneracy_distributed_round_cap(spark):
    # path graph peels 2 ends per wave — force the cap and check leftovers
    path = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(path, "src long, dst long")
    order, degen = degeneracy_order_distributed(df, max_rounds=2)
    assert degen == 1
    rows = order.collect()
    assert sorted(r["rank"] for r in rows) == list(range(11))
    got = _collect_cliques(maximal_cliques(df, order=order))
    assert got == python_bk(path)


def test_cliques_hub_split_matches_unsplit(spark):
    """Forcing a tiny max_group_deg routes hub vertices through the
    pair-split path (one BK level deeper, common-neighborhood groups);
    the clique set must be identical to the unsplit run and the oracle."""
    pairs = random_graph(30, 160, seed=21)
    df = spark.createDataFrame(pairs, "src long, dst long")
    oracle = python_bk(pairs)
    # cap low enough that several vertices split (random_graph(30,160)
    # has average degree ~10)
    got_split = _collect_cliques(maximal_cliques(df, max_group_deg=4))
    assert got_split == oracle
    got_unsplit = _collect_cliques(maximal_cliques(df, max_group_deg=10**9))
    assert got_unsplit == oracle


def test_cliques_hub_star_and_k4(spark):
    """A hub star (hub adjacent to many leaves, no leaf-leaf edges) under
    the pair path: every {hub, leaf} edge with empty common neighborhood
    must still be emitted as a maximal 2-clique."""
    hub_star = [(0, i) for i in range(1, 12)]
    k4 = [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
    bridge = [(0, 20)]
    pairs = hub_star + k4 + bridge
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = _collect_cliques(maximal_cliques(df, max_group_deg=3))
    assert got == python_bk(pairs)


def test_cliques_partial_order_guard(spark):
    """A caller-supplied order missing some vertices must not crash
    (ADVICE r2 #3): covered vertices' cliques are enumerated over the
    order's scope."""
    k3 = [(0, 1), (1, 2), (0, 2), (2, 3)]
    df = spark.createDataFrame(k3, "src long, dst long")
    order = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2)], "v long, rank long"
    )  # vertex 3 missing
    got = _collect_cliques(maximal_cliques(df, order=order))
    assert (0, 1, 2) in got

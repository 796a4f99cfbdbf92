"""PageRank vs dense numpy power-iteration oracle (allclose 1e-6 — the
north rule's parity criterion), plus checkpoint/resume equivalence."""

import numpy as np
import pytest

from tests.conftest import random_graph, undirected_simple

from graphsetintersection_spark.operators.pagerank import pagerank
from graphsetintersection_spark.plans.checkpoint import CheckpointManager


def numpy_pagerank(pairs, alpha=0.85, iters=40):
    """Dense oracle with identical semantics: damping + dangling mass."""
    edges = {(u, v) for u, v in pairs if u != v}
    verts = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out_deg = np.zeros(n)
    for u, v in edges:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        share = np.where(out_deg > 0, r / np.maximum(out_deg, 1), 0.0)
        for u, v in edges:
            contrib[idx[v]] += share[idx[u]]
        dangling = r[out_deg == 0].sum()
        r = (1 - alpha) / n + alpha * (contrib + dangling / n)
    return {v: r[idx[v]] for v in verts}


def _assert_allclose(result_df, oracle, atol=1e-6):
    got = {row["v"]: row["rank"] for row in result_df.collect()}
    assert set(got) == set(oracle)
    for v in oracle:
        assert got[v] == pytest.approx(oracle[v], abs=atol), f"vertex {v}"


def test_pagerank_allclose_tiny(spark, tiny_graph):
    pairs, df = tiny_graph
    oracle = numpy_pagerank(pairs, iters=40)
    res = pagerank(df, max_iter=40, tol=None)
    assert res.iterations == 40
    _assert_allclose(res.ranks, oracle)
    total = sum(r["rank"] for r in res.ranks.collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_with_dangling_and_disconnected(spark):
    # 0→1→2 (2 dangling), isolated pair 5→6, 6 dangling
    pairs = [(0, 1), (1, 2), (5, 6)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    oracle = numpy_pagerank(pairs, iters=30)
    res = pagerank(df, max_iter=30, tol=None)
    _assert_allclose(res.ranks, oracle)


def test_pagerank_convergence_stop(spark, tiny_graph):
    _, df = tiny_graph
    res = pagerank(df, max_iter=100, tol=1e-10)
    assert res.converged
    assert res.iterations < 100
    assert res.deltas[-1] < 1e-10


def test_pagerank_resume_matches_uninterrupted(spark, tiny_graph, tmp_path):
    pairs, df = tiny_graph
    full = pagerank(df, max_iter=12, tol=None)
    full_ranks = {r["v"]: r["rank"] for r in full.ranks.collect()}

    # interrupted run: 5 iterations committed, then a fresh call resumes
    ck = CheckpointManager(str(tmp_path), "pr-run", "pagerank")
    pagerank(df, max_iter=5, tol=None, checkpointer=ck)
    assert ck.latest_iteration() == 4
    resumed = pagerank(df, max_iter=12, tol=None, checkpointer=ck)
    res_ranks = {r["v"]: r["rank"] for r in resumed.ranks.collect()}

    assert set(res_ranks) == set(full_ranks)
    for v in full_ranks:
        assert res_ranks[v] == pytest.approx(full_ranks[v], abs=1e-12)
    # manifest carries per-partition lineage + metrics for every iteration
    entries = ck.committed()
    assert [e["iteration"] for e in entries] == list(range(12))
    assert all(e["partitions"] for e in entries)
    assert all("n_vertices" in e["metrics"] for e in entries)


def test_pagerank_kernel_parity(spark, tiny_graph):
    """Broadcast-vector kernel path ≡ DataFrame path (allclose 1e-12) —
    including dangling vertices and non-dense ids."""
    from graphsetintersection_spark.operators.pagerank import pagerank_kernel

    pairs, df = tiny_graph
    # shift ids so they are NOT dense 0..V-1 (exercises the relabel)
    shifted = df.selectExpr("src * 7 + 100 as src", "dst * 7 + 100 as dst")
    r_df = pagerank(shifted, max_iter=8, tol=None)
    r_k = pagerank_kernel(shifted, max_iter=8)
    a = {r["v"]: r["rank"] for r in r_df.ranks.collect()}
    b = {r["v"]: r["rank"] for r in r_k.ranks.collect()}
    assert set(a) == set(b)
    assert max(abs(a[v] - b[v]) for v in a) < 1e-12


def test_pagerank_kernel_dangling_and_tol(spark):
    from graphsetintersection_spark.operators.pagerank import pagerank_kernel

    # 0→1→2, 2 dangling; plus isolated pair 3→4
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "src long, dst long"
    )
    r_df = pagerank(df, max_iter=30, tol=None)
    r_k = pagerank_kernel(df, max_iter=30, tol=1e-14)
    a = {r["v"]: r["rank"] for r in r_df.ranks.collect()}
    b = {r["v"]: r["rank"] for r in r_k.ranks.collect()}
    assert max(abs(a[v] - b[v]) for v in a) < 1e-9
    assert abs(sum(b.values()) - 1.0) < 1e-9


def numpy_ppr(pairs, seeds, alpha=0.85, iters=40, weights=None):
    """Dense personalized-PageRank oracle: restart and dangling mass land
    on the seed distribution p instead of uniformly."""
    edges = {(u, v) for u, v in pairs if u != v}
    verts = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    p = np.zeros(n)
    for j, s in enumerate(seeds):
        if s in idx:
            p[idx[s]] += (weights[j] if weights else 1.0)
    p /= p.sum()
    out_deg = np.zeros(n)
    for u, v in edges:
        out_deg[idx[u]] += 1
    r = p.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        share = np.where(out_deg > 0, r / np.maximum(out_deg, 1), 0.0)
        for u, v in edges:
            contrib[idx[v]] += share[idx[u]]
        dangling = r[out_deg == 0].sum()
        r = (1 - alpha) * p + alpha * (contrib + dangling * p)
    return {v: r[idx[v]] for v in verts}


def test_ppr_allclose_and_mass_conserved(spark, tiny_graph):
    from graphsetintersection_spark.operators.pagerank import (
        personalized_pagerank,
    )

    pairs, df = tiny_graph
    seeds_list = sorted({x for e in pairs for x in e})[:3]
    seeds = spark.createDataFrame([(s,) for s in seeds_list], "v long")
    res = personalized_pagerank(df, seeds, max_iter=40, tol=None)
    _assert_allclose(res.ranks, numpy_ppr(pairs, seeds_list))
    total = res.ranks.groupBy().sum("rank").collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_ppr_uniform_seeds_equals_pagerank(spark, tiny_graph):
    """Seeding EVERY vertex uniformly reduces personalized PageRank to
    classic PageRank — the two paths must agree to allclose 1e-9."""
    from graphsetintersection_spark.operators.pagerank import (
        personalized_pagerank,
    )

    pairs, df = tiny_graph
    verts = sorted({x for e in pairs for x in e})
    seeds = spark.createDataFrame([(v,) for v in verts], "v long")
    ppr = personalized_pagerank(df, seeds, max_iter=15, tol=None)
    pr = pagerank(df, max_iter=15, tol=None)
    got = {r["v"]: r["rank"] for r in ppr.ranks.collect()}
    exp = {r["v"]: r["rank"] for r in pr.ranks.collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)


def test_ppr_mass_localized_to_seed_component(spark):
    """On a disconnected graph, rank mass can only reach vertices the
    random walk can reach: seeding one component leaves the other at
    exactly zero."""
    from graphsetintersection_spark.operators.pagerank import (
        personalized_pagerank,
    )

    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "v long")
    res = personalized_pagerank(df, seeds, max_iter=30, tol=None)
    ranks = {r["v"]: r["rank"] for r in res.ranks.collect()}
    assert all(ranks[v] > 0 for v in (0, 1, 2))
    assert all(ranks[v] == 0.0 for v in (10, 11, 12))
    _assert_allclose(res.ranks, numpy_ppr(pairs, [0], iters=30))


def test_ppr_weighted_seeds_and_renormalization(spark, tiny_graph):
    """Weighted restart + seeds absent from the graph: missing seeds are
    dropped and the surviving weights renormalized; duplicate seed rows
    sum. Error cases raise instead of emitting a degenerate vector."""
    from graphsetintersection_spark.operators.pagerank import (
        personalized_pagerank,
    )

    pairs, df = tiny_graph
    verts = sorted({x for e in pairs for x in e})
    a, b = verts[0], verts[1]
    seeds = spark.createDataFrame(
        # (v, w): b carries 3x a's weight via a duplicate row; 10**9 is
        # absent from the graph and must be dropped+renormalized away
        [(a, 1.0), (b, 1.0), (b, 2.0), (10**9, 5.0)],
        "v long, w double",
    )
    res = personalized_pagerank(df, seeds, max_iter=40, tol=None,
                                weight_col="w")
    _assert_allclose(
        res.ranks, numpy_ppr(pairs, [a, b], weights=[1.0, 3.0])
    )
    with pytest.raises(ValueError, match="no seed vertices"):
        personalized_pagerank(
            df, spark.createDataFrame([(10**9,)], "v long"), max_iter=2
        )
    with pytest.raises(ValueError, match="non-negative"):
        personalized_pagerank(
            df,
            spark.createDataFrame([(a, -1.0)], "v long, w double"),
            max_iter=2,
            weight_col="w",
        )
    # NaN weight: every direct comparison is False, so only an inverted
    # guard catches it — must raise, not return an all-NaN rank vector
    with pytest.raises(ValueError, match="non-negative"):
        personalized_pagerank(
            df,
            spark.createDataFrame([(a, float("nan"))], "v long, w double"),
            max_iter=2,
            weight_col="w",
        )


def test_ppr_shuffle_salted_path_parity(spark, tiny_graph):
    """The teleport vector must behave identically on the shuffle+salt
    round shape (the at-scale path) as on the broadcast default."""
    from graphsetintersection_spark.operators.pagerank import (
        personalized_pagerank,
    )

    pairs, df = tiny_graph
    seeds_list = sorted({x for e in pairs for x in e})[:3]
    seeds = spark.createDataFrame([(s,) for s in seeds_list], "v long")
    res = personalized_pagerank(
        df, seeds, max_iter=20, tol=None,
        broadcast_ranks=False, salt_hubs=4,
    )
    _assert_allclose(res.ranks, numpy_ppr(pairs, seeds_list, iters=20))

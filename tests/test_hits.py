"""HITS vs dense numpy oracle, broadcast/shuffle/salted path parity, and
cache hygiene."""

import numpy as np
import pytest

from tests.conftest import random_graph

from graphsetintersection_spark.operators.hits import hits


def numpy_hits(pairs, iters=10):
    """Dense oracle with identical semantics: synchronous half-steps,
    L2 normalization over the full vertex set each half-step."""
    edges = {(u, v) for u, v in pairs if u != v}
    verts = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for u, v in edges:
        A[idx[u], idx[v]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    return (
        {v: h[idx[v]] for v in verts},
        {v: a[idx[v]] for v in verts},
    )


def _assert_scores_allclose(res, hub_exp, auth_exp, atol=1e-6):
    rows = {r["v"]: (r["hub"], r["auth"]) for r in res.scores.collect()}
    assert set(rows) == set(hub_exp)
    for v in hub_exp:
        assert rows[v][0] == pytest.approx(hub_exp[v], abs=atol), f"hub {v}"
        assert rows[v][1] == pytest.approx(auth_exp[v], abs=atol), f"auth {v}"


def test_hits_allclose_tiny(spark, tiny_graph):
    pairs, df = tiny_graph
    hub_exp, auth_exp = numpy_hits(pairs)
    _assert_scores_allclose(hits(df, max_iter=10, tol=None), hub_exp, auth_exp)


def test_hits_known_star(spark):
    """A directed star u→{a,b,c}: u is the only hub (hub=1), the leaves
    are equal authorities (1/√3 each), and the roles don't bleed."""
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    res = hits(df, max_iter=5, tol=None)
    rows = {r["v"]: (r["hub"], r["auth"]) for r in res.scores.collect()}
    assert rows[0][0] == pytest.approx(1.0)
    assert rows[0][1] == 0.0
    for leaf in (1, 2, 3):
        assert rows[leaf][0] == 0.0
        assert rows[leaf][1] == pytest.approx(1 / np.sqrt(3.0))


def test_hits_broadcast_shuffle_salted_parity(spark):
    """All three execution paths must return identical scores."""
    pairs = random_graph(200, 1500, seed=31)
    df = spark.createDataFrame(pairs, "src long, dst long")
    hub_exp, auth_exp = numpy_hits(pairs, iters=8)
    for kwargs in (
        {"broadcast_scores": True},
        {"broadcast_scores": False, "salt_hubs": None},
        {"broadcast_scores": False, "salt_hubs": 4},
    ):
        res = hits(df, max_iter=8, tol=None, **kwargs)
        _assert_scores_allclose(res, hub_exp, auth_exp)


def test_hits_convergence_and_guard(spark, tiny_graph):
    pairs, df = tiny_graph
    res = hits(df, max_iter=100, tol=1e-12)
    assert res.converged and res.iterations < 100
    hub_exp, auth_exp = numpy_hits(pairs, iters=res.iterations)
    _assert_scores_allclose(res, hub_exp, auth_exp)
    with pytest.raises(ValueError, match="max_iter"):
        hits(df, max_iter=0)
    empty = spark.createDataFrame([], "src long, dst long")
    r = hits(empty)
    assert r.scores.count() == 0 and r.converged


def test_hits_releases_caches(spark, tiny_graph):
    """The two stationary edge caches and the vertex cache are released
    when the call returns. Iteration snapshots are localCheckpoints —
    reference-tracked by ContextCleaner (cleaned when the frames drop),
    so per the engine-wide convention (tests/test_dedup.py leak test)
    only non-checkpoint persistent RDDs count as leaks."""
    _, df = tiny_graph
    sc = spark.sparkContext

    def cache_rdd_ids():
        m = sc._jsc.getPersistentRDDs()
        return {
            k for k in m.keySet().toArray()
            if not m.get(k).rdd().isLocallyCheckpointed()
        }

    before = cache_rdd_ids()
    res = hits(df, max_iter=4, tol=None)
    res.scores.count()
    leaked = cache_rdd_ids() - before
    assert not leaked, f"leaked non-checkpoint caches: {leaked}"

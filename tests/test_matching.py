"""Subgraph matching vs itertools brute-force oracle."""

from itertools import permutations

from tests.conftest import random_graph, undirected_simple

from graphsetintersection_spark.operators.matching import (
    LabelSubgraph,
    subgraph_match,
    subgraph_match_count,
)


def brute_embeddings(pairs, vlabels, query: LabelSubgraph):
    und = undirected_simple(pairs)
    adj = {}
    for e in und:
        u, v = tuple(e)
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = sorted(adj)
    out = set()
    for perm in permutations(verts, query.v_num):
        if any(vlabels[perm[i]] != query.labels[i] for i in range(query.v_num)):
            continue
        if all(perm[b] in adj[perm[a]] for a, b in query.edges):
            out.add(perm)
    return sorted(out)


def _labels_df(spark, vlabels):
    return spark.createDataFrame(
        [(int(v), int(l)) for v, l in vlabels.items()], "v long, label int"
    )


def _run(spark, pairs, vlabels, query):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = sorted(
        tuple(r[f"v{i}"] for i in range(query.v_num))
        for r in subgraph_match(edges, _labels_df(spark, vlabels), query).collect()
    )
    assert got == brute_embeddings(pairs, vlabels, query)
    return got


def test_labeled_triangle_query(spark):
    pairs = random_graph(20, 70, seed=13)
    vlabels = {v: v % 3 for e in undirected_simple(pairs) for v in e}
    q = LabelSubgraph(3, [(0, 1), (1, 2), (0, 2)], [0, 1, 2])
    got = _run(spark, pairs, vlabels, q)
    assert len(got) > 0


def test_path_and_star_queries(spark):
    pairs = random_graph(18, 45, seed=2)
    vlabels = {v: v % 2 for e in undirected_simple(pairs) for v in e}
    path = LabelSubgraph(3, [(0, 1), (1, 2)], [0, 1, 0])
    _run(spark, pairs, vlabels, path)
    star = LabelSubgraph(4, [(0, 1), (0, 2), (0, 3)], [1, 0, 0, 0])
    _run(spark, pairs, vlabels, star)


def test_square_query_and_count(spark):
    # 4-cycle query on a graph that contains exactly one labeled square
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    vlabels = {0: 0, 1: 1, 2: 0, 3: 1}
    q = LabelSubgraph(4, [(0, 1), (1, 2), (2, 3), (3, 0)], [0, 1, 0, 1])
    edges_df = None
    got = _run(spark, pairs, vlabels, q)
    # embeddings = automorphisms of the square mapping: 0↔2, 1↔3 swaps → 4
    assert len(got) == 4

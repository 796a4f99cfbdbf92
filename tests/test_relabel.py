"""Degree relabel: bijection invariant, triangle-count invariance under
relabel, and comp_ratio densification (the reference's reorder contract —
src/porder.cpp:471-495, metric :295-351)."""

from tests.conftest import brute_triangles, random_graph

from graphsetintersection_spark.operators.relabel import (
    apply_order,
    comp_ratio,
    continuous_ids,
    degree_order,
    leaf_node_count,
    select_bignode,
)
from graphsetintersection_spark.operators.triangle import triangle_count_kernel


def test_degree_order_is_bijection_and_dense(spark, tiny_graph):
    pairs, df = tiny_graph
    order = degree_order(df).collect()
    n = len(order)
    new_ids = sorted(r["new_id"] for r in order)
    assert new_ids == list(range(n))  # continuous 0-based (README.md:44)
    orgs = {r["org_id"] for r in order}
    assert len(orgs) == n


def test_relabel_preserves_triangles(spark, tiny_graph):
    pairs, df = tiny_graph
    expected = brute_triangles(pairs)
    relabeled = apply_order(df, degree_order(df))
    assert triangle_count_kernel(relabeled) == expected


def test_degree_relabel_densifies_comp_ratio(spark):
    # Zipf-ish graph: hubs get small ids after relabel → lower comp_ratio
    import numpy as np

    rng = np.random.default_rng(3)
    n = 500
    dst = (n * rng.random(4000) ** 3).astype(int)  # power-law-ish popularity
    src = rng.integers(0, n, 4000)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst) if a != b],
        "src long, dst long",
    )
    before = comp_ratio(df)
    after = comp_ratio(apply_order(df, degree_order(df)))
    assert after <= before  # densification (usually strictly better)


def test_continuous_ids(spark):
    df = spark.createDataFrame(
        [(100, 7), (7, 55), (55, 100)], "src long, dst long"
    )
    ids = {r["org_id"]: r["new_id"] for r in continuous_ids(df).collect()}
    assert ids == {7: 0, 55: 1, 100: 2}


def test_select_bignode_covers_ratio(spark, tiny_graph):
    pairs, df = tiny_graph
    from graphsetintersection_spark.operators.edges import degrees

    total = sum(r["deg"] for r in degrees(df).collect())
    hubs = select_bignode(df, deg_ratio=0.3).collect()
    cum = sum(r["deg"] for r in hubs)
    assert cum >= 0.3 * total
    # minimality: dropping the last (smallest-degree) hub falls below
    smallest = min(r["deg"] for r in hubs)
    assert cum - smallest < 0.3 * total


def test_leaf_node_count(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long")
    assert leaf_node_count(df) == 1  # vertex 3

"""Labeled subgraph matching — the reference's ``sm`` binary.

Semantics (src/org_subgraph_match.cpp:72-184): enumerate ALL embeddings of
a small labeled query graph Q in the labeled data graph G (undirected,
doubled edges): an embedding maps query vertices to DISTINCT data vertices
preserving edges and labels.

The reference's mini query-engine lifecycle maps 1:1 onto a driver-side
planner emitting a Catalyst join chain:

- analyze: query adjacency (:77-84)                → Python dict
- optimize: rarest-label start vertex (:99-103) + DFS join order
  (gen_join_order :186-197), candidate lists ordered by label frequency
  (:86-93)                                         → driver planner below
- execute: per new query vertex, intersect candidates with adjacency of
  every bound neighbor (:138-153 — pipelined binary intersections)
  → one equi-join with the edge table per (new vertex, bound neighbor)
  query edge: the FIRST bound neighbor binds via join fan-out, each
  additional one is an edge-existence semi-join. Injectivity filter
  (:155-167) → pairwise != predicates.
- project: restore query-vertex column order (:173-181) → select.

Catalyst then does what the reference hand-codes: join reordering within
the chain, broadcast of the (small) label dimension, AQE skew splits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsetintersection_spark.operators.edges import canonicalize, symmetrize


@dataclass
class LabelSubgraph:
    """The reference's query-graph record (src/org_subgraph_match.hpp:7-15,
    parsed at src/sm.cpp:15-43): v_num vertices 0..v_num-1, undirected
    edges, one int label per vertex."""

    v_num: int
    edges: list[tuple[int, int]]
    labels: list[int]


def _join_order(q: LabelSubgraph, label_freq: dict[int, int]) -> list[int]:
    """DFS from the rarest-label vertex (reference :99-105, :186-197)."""
    qadj: dict[int, set[int]] = {i: set() for i in range(q.v_num)}
    for a, b in q.edges:
        qadj[a].add(b)
        qadj[b].add(a)
    start = min(
        range(q.v_num), key=lambda i: (label_freq.get(q.labels[i], 0), i)
    )
    seen, order, stack = {start}, [start], [start]
    while stack:
        cur = stack[-1]
        nxt = [
            u for u in sorted(
                qadj[cur] - seen,
                key=lambda u: (label_freq.get(q.labels[u], 0), u),
            )
        ]
        if nxt:
            u = nxt[0]
            seen.add(u)
            order.append(u)
            stack.append(u)
        else:
            stack.pop()
    # disconnected query vertices appended last (cartesian with labels)
    for i in range(q.v_num):
        if i not in seen:
            order.append(i)
    return order


def subgraph_match(
    edges: DataFrame,
    labels: DataFrame,
    query: LabelSubgraph,
) -> DataFrame:
    """All embeddings of ``query``: one column ``v{i}`` per query vertex.

    ``edges``: directed edge table (symmetrized internally, matching the
    reference's doubled-edge requirement); ``labels``: (v, label)."""
    und = symmetrize(canonicalize(edges))
    lab = labels.select(
        F.col("v").cast("long").alias("v"), F.col("label").cast("int").alias("label")
    )

    freq_rows = lab.groupBy("label").count().collect()
    label_freq = {r["label"]: r["count"] for r in freq_rows}
    order = _join_order(query, label_freq)

    qadj: dict[int, set[int]] = {i: set() for i in range(query.v_num)}
    for a, b in query.edges:
        qadj[a].add(b)
        qadj[b].add(a)

    first = order[0]
    matches = lab.where(F.col("label") == query.labels[first]).select(
        F.col("v").alias(f"v{first}")
    )
    bound = [first]
    for qv in order[1:]:
        bound_nbrs = [b for b in bound if b in qadj[qv]]
        col = f"v{qv}"
        cand = lab.where(F.col("label") == query.labels[qv]).select(
            F.col("v").alias(col)
        )
        if not bound_nbrs:
            matches = matches.crossJoin(cand)
        else:
            # bind via the first query edge: matches ⋈ edges on the bound
            # neighbor, restricted to candidate labels
            b0 = bound_nbrs[0]
            e0 = und.select(
                F.col("src").alias(f"v{b0}"), F.col("dst").alias(col)
            ).join(cand, col)
            matches = matches.join(e0, f"v{b0}")
            # every additional bound neighbor: edge-existence semi-join
            for bn in bound_nbrs[1:]:
                en = und.select(
                    F.col("src").alias(f"v{bn}"), F.col("dst").alias(col)
                )
                matches = matches.join(en, [f"v{bn}", col], "left_semi")
        # injectivity (reference :155-167): new vertex differs from all bound
        for bv in bound:
            matches = matches.where(F.col(col) != F.col(f"v{bv}"))
        bound.append(qv)

    # project back to query vertex order (reference :173-181)
    return matches.select(*[f"v{i}" for i in range(query.v_num)])


def subgraph_match_count(edges: DataFrame, labels: DataFrame, query: LabelSubgraph) -> int:
    """Embedding count — the reference's per-query answer (src/sm.cpp:60-77)."""
    return subgraph_match(edges, labels, query).count()

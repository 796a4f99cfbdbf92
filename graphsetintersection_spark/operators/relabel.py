"""Vertex reordering / relabeling — the reference's ``reorder`` module.

The reference ships seven ordering algorithms (``src/porder.cpp``, 1213 LoC;
dispatch ``src/reorder.cpp:48-77``) whose shared contract is: produce a
permutation ``org2newid`` and rewrite the edge list through it
(``src/porder.cpp:226-229``). The default GRO greedy (greedy_mheap,
``src/porder.cpp:142-235``) is inherently sequential; its scalable cousin —
which the reference also ships as ``deg_desc_order``
(``src/porder.cpp:471-495``) and which GRO's own tie-breaking falls back to
(``hybrid_bfsdeg``, ``src/porder.cpp:93-140``) — is degree-descending
relabel, which is what this engine implements as a distributed job:
hubs get the densest (smallest) ids, so BSR-style packed intersections
touch fewer words.

Also here:
- ``comp_ratio``  — the densification metric the reorderings are judged by
  (``src/porder.cpp:295-351``, printed by tc at
  ``src/bitpack_triangle_count.cpp:66-67``): average distinct
  ``nbr >> PACK_SHIFT`` blocks per edge; lower = denser packing.
- ``select_bignode`` — smallest hub set covering a target fraction of total
  degree (``src/porder.cpp:353-392``); feeds hub-adjacency broadcast and
  salting decisions.
- ``continuous_ids`` — arbitrary → continuous 0-based ids
  (``python/trans_graph.py:3-22``, required by README.md:44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphsetintersection_spark.kernels import PACK_SHIFT
from graphsetintersection_spark.operators.edges import degrees


def degree_order(edges: DataFrame, descending: bool = True) -> DataFrame:
    """Permutation (org_id, new_id): new ids assigned by total degree
    (desc by default), ties broken by original id for determinism.
    Reference deg_desc_order / deg_order (src/porder.cpp:445-495).

    new_id is 0-based and continuous — the invariant the reference demands
    of all graphs (README.md:44).

    Scale note: the window has a single global ordering; Spark executes
    row_number over a range-partitioned sort (no single-reducer collapse is
    avoided only for rank-like windows with partition keys). For true
    10^12-vertex scale, swap to the zipWithIndex-style two-phase id assign:
    sort, count per partition, prefix-sum offsets — semantics identical.
    """
    deg = degrees(edges)
    order_cols = (
        [F.col("deg").desc(), F.col("v").asc()]
        if descending
        else [F.col("deg").asc(), F.col("v").asc()]
    )
    w = Window.orderBy(*order_cols)
    return deg.select(
        F.col("v").alias("org_id"),
        (F.row_number().over(w) - 1).cast("long").alias("new_id"),
    )


def continuous_ids(edges: DataFrame, id_col_name: str = "org_id") -> DataFrame:
    """Arbitrary vertex ids → continuous 0-based (python/trans_graph.py:3-22).
    Deterministic: ordered by original id."""
    verts = (
        edges.select(F.col("src").alias(id_col_name))
        .union(edges.select(F.col("dst").alias(id_col_name)))
        .distinct()
    )
    w = Window.orderBy(F.col(id_col_name).asc())
    return verts.select(
        id_col_name, (F.row_number().over(w) - 1).cast("long").alias("new_id")
    )


def apply_order(edges: DataFrame, order: DataFrame) -> DataFrame:
    """Rewrite the edge list through a permutation — two hash joins
    (reference: the relabel loop at src/porder.cpp:226-229). The permutation
    is 2 longs per vertex; for web graphs it is usually broadcastable up to
    ~10^8 vertices, else Catalyst falls back to SMJ automatically."""
    o_src = order.select(
        F.col("org_id").alias("src"), F.col("new_id").alias("_new_src")
    )
    o_dst = order.select(
        F.col("org_id").alias("dst"), F.col("new_id").alias("_new_dst")
    )
    return (
        edges.join(o_src, "src")
        .join(o_dst, "dst")
        .select(
            F.col("_new_src").alias("src"),
            F.col("_new_dst").alias("dst"),
        )
    )


def comp_ratio(edges: DataFrame, pack_shift: int = PACK_SHIFT) -> float:
    """BSR densification metric: (number of packed base-words across all
    adjacency lists) / (number of edges). Lower is better; 1.0 means every
    neighbor needs its own word, 1/64 is perfect packing.
    Reference: POrder::comp_ratio (src/porder.cpp:295-351)."""
    blocks = (
        edges.select(
            "src", F.shiftright(F.col("dst"), pack_shift).alias("blk")
        )
        .groupBy("src")
        .agg(F.countDistinct("blk").alias("n_blocks"), F.count("*").alias("n_edges"))
        .agg(F.sum("n_blocks").alias("b"), F.sum("n_edges").alias("e"))
        .collect()[0]
    )
    return float(blocks["b"]) / float(blocks["e"]) if blocks["e"] else 0.0


def select_bignode(edges: DataFrame, deg_ratio: float = 0.3) -> DataFrame:
    """Smallest set of highest-degree vertices covering ``deg_ratio`` of
    total degree (reference src/porder.cpp:353-392). Returns
    (v, deg, cum_deg). Used to pick the hub set for adjacency broadcast
    and salted aggregation."""
    deg = degrees(edges)
    total = deg.agg(F.sum("deg")).collect()[0][0] or 0
    w = Window.orderBy(F.col("deg").desc(), F.col("v").asc())
    ranked = deg.select(
        "v", "deg", F.sum("deg").over(w).alias("cum_deg")
    )
    # keep rows until cumulative degree first reaches the threshold
    thresh = float(total) * deg_ratio
    return ranked.where(F.col("cum_deg") - F.col("deg") < thresh)


def leaf_node_count(edges: DataFrame) -> int:
    """Count degree-1 vertices (src/porder.cpp:82-91)."""
    return degrees(edges).where(F.col("deg") == 1).count()

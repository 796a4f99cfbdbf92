"""Shared preparation for iterative ship-vertex-state algorithms (label
propagation, min-label connected components) — the same join-strategy
machinery ``pagerank_df_prepare`` uses (operators/pagerank.py:106-166),
extracted so every per-round loop gets it:

- While the vertex-state vector fits in executor memory it is BROADCAST
  into each round's join and the symmetrized edge frame is cached
  hash-partitioned by ``dst`` — then the per-round neighbor aggregation
  (keyed on dst) needs NO exchange at all: zero per-round shuffle of the
  edge frame, labels ship to the data. Cutover ~10M vertices, like
  PageRank's rank vector.
- Beyond the cutover the edge frame is cached hash-partitioned by
  ``src`` AND sorted within partitions, so the per-round sort-merge join
  exchanges and sorts only the (small) label side; Zipf-hub skew on the
  aggregation key is handled by the shared salted two-stage aggregation
  (plans.skew), probed once here.

The reference runs single-node in-memory arrays (label/state updates in
``src/``'s per-vertex loops); this module is the distributed analog of
keeping the graph stationary and shipping only the per-vertex state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsetintersection_spark.operators.edges import (
    symmetrize_partitioned,
    vertices,
)
from graphsetintersection_spark.plans.skew import (
    HubSaltPlan,
    decide_hub_salting,
    mark_hubs,
)

BROADCAST_STATE_MAX_VERTICES = 10_000_000


@dataclass
class PreparedUnd:
    """Stationary state for iterative undirected vertex-state loops."""

    verts: DataFrame
    n: int
    n_und: int
    und_j: DataFrame  # symmetrized, partitioned, hub-marked when salted
    broadcast_labels: bool
    salt_plan: HubSaltPlan | None
    self_rows: bool  # und_j carries synthetic (v, v) rows
    _caches: tuple

    def unpersist(self) -> None:
        for c in self._caches:
            c.unpersist()


def prepare_undirected(
    edges: DataFrame,
    broadcast_labels: bool | None = None,
    salt_hubs: int | str | None = "auto",
    num_partitions: int | None = None,
    self_rows: bool = True,
) -> PreparedUnd:
    """One-time index build: symmetrize + partition for the chosen join
    strategy, cache, probe skew (shuffle path only). Callers own the
    returned caches via ``unpersist()``.

    ``self_rows`` appends a synthetic (v, v) row per vertex so each
    round's per-dst aggregation sees the vertex's own state — the rounds
    then emit one row per vertex straight from the aggregate and the
    per-round labels⨝result finalize join disappears."""
    # the partition key depends on the strategy, which depends on n — so
    # the vertex set (same either way) is counted first, off the filtered
    # view, and the big frame is built ONCE with the right key.
    # vertices() ends in its own distinct, so the edge-level distinct of
    # canonicalize() is subsumed — running both paid an extra Exchange
    # per prepare for the same vertex set (guide §2.4).
    # (r6 note: transiently persisting the cast/filtered frame here to
    # save the repeated input-plan scans was MEASURED SLOWER end-to-end —
    # the cache materialization barrier cost more than the parallel
    # re-scans it saved — so the uncached shape stands.)
    filtered = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
    )
    verts = vertices(filtered).persist()
    n = verts.count()
    if broadcast_labels is None:
        broadcast_labels = n <= BROADCAST_STATE_MAX_VERTICES
    key = "dst" if broadcast_labels else "src"
    und = symmetrize_partitioned(
        edges,
        key,
        num_partitions=num_partitions,
        self_pairs=verts if self_rows else None,
    )
    if not broadcast_labels:
        und = und.sortWithinPartitions("src")
    und = und.persist()
    n_und = und.count()

    # "auto" salting is a shuffle-path concern (the broadcast path's
    # aggregations are exchange-free on the dst partitioning, where a
    # hub inflates one partition's row count but never one reducer's
    # combine); an EXPLICIT salt count is honored on either path (tests
    # force it on small graphs to exercise the salted rounds)
    plan = None
    if salt_hubs and n:
        if salt_hubs == "auto":
            if not broadcast_labels:
                plan = decide_hub_salting(und, "dst", total_rows=n_und)
        else:
            plan = decide_hub_salting(
                und, "dst", salts=int(salt_hubs), force=True
            )
    und_j = mark_hubs(und, "dst", plan) if plan is not None else und
    return PreparedUnd(
        verts=verts,
        n=n,
        n_und=n_und,
        und_j=und_j,
        broadcast_labels=broadcast_labels,
        salt_plan=plan,
        self_rows=self_rows,
        _caches=(und, verts),
    )


def resolve_round_args(
    und_or_prep, salt_plan, broadcast_labels, self_rows
):
    """Resolve a round's (und_j, salt_plan, broadcast_labels, self_rows).

    Rounds accept the ``PreparedUnd`` itself as the edge argument — the
    safe calling convention (ADVICE r4 #3): the three strategy flags
    travel WITH the prepared frame, so a caller cannot pair self-row
    edges with ``self_rows=False`` (which would silently count each
    synthetic (v, v) row as a real vote in LPA's count aggregate).
    Passing a PreparedUnd together with explicit non-default flags is an
    error — the flags are the prep's to own. Raw-DataFrame callers keep
    the explicit flags (tests build hand-rolled frames)."""
    if isinstance(und_or_prep, PreparedUnd):
        if salt_plan is not None or broadcast_labels or self_rows:
            raise ValueError(
                "pass either a PreparedUnd OR explicit flags, not both — "
                "the prep already carries salt_plan/broadcast_labels/"
                "self_rows"
            )
        p = und_or_prep
        return p.und_j, p.salt_plan, p.broadcast_labels, p.self_rows
    return und_or_prep, salt_plan, broadcast_labels, self_rows


def state_join(
    und_j: DataFrame, labels: DataFrame, broadcast_labels: bool
) -> DataFrame:
    """The per-round edge ⨝ state join: state renamed to src, broadcast
    when the strategy says so (then the cached dst-partitioned edge frame
    is never exchanged and the downstream dst-keyed aggregation runs
    exchange-free on top of it)."""
    labels_src = labels.withColumnRenamed("v", "src")
    if broadcast_labels:
        labels_src = F.broadcast(labels_src)
    return und_j.join(labels_src, "src")

"""Connected components — exact integer fixpoint, two implementations.

Component id := the MINIMUM vertex id in the component (deterministic,
exactly comparable across engines — the north rule demands exact equality
at convergence).

1. ``connected_components_minlabel`` — synchronous min-label propagation:
   each round every vertex takes min(own label, neighbors' labels) over the
   symmetrized edge set. One shuffle-agg per round; converges in
   O(diameter) rounds. Web graphs have small effective diameter, and each
   round is a single map-side-combinable ``min`` aggregate (hub-skew safe).

2. ``connected_components_starcontraction`` — alternating large-star /
   small-star contraction (Kiveris et al., "Connected Components in
   MapReduce and Beyond", SoCC'14): converges in O(log² n) rounds on any
   graph — the scale path for high-diameter graphs. Each round rewrites a
   parent-pointer edge set; both stars are pure groupBy/join dataflow.

Both checkpoint per round via plans.checkpoint and resume mid-algorithm.
Parity of the two implementations is itself a test (the reference's
Org/BP/Roaring pattern, src/tc.cpp:14-16).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsetintersection_spark.operators.edges import canonicalize, symmetrize, vertices
from graphsetintersection_spark.plans.checkpoint import CheckpointManager


@dataclass
class ComponentsResult:
    components: DataFrame  # (v: long, component: long)
    rounds: int
    converged: bool


def cc_minlabel_round(
    und_j, labels, salt_plan=None, broadcast_labels=False, self_rows=False
):
    """One synchronous min-label round over the symmetrized edge set:
    every vertex takes min(own label, incoming neighbor labels). ``und_j``
    must carry a ``_hub`` column when ``salt_plan`` is given (mark_hubs).

    min is map-side combinable; with a salt plan, hub dsts pre-combine
    under salts so no single reducer owns a whole hub (the Zipf-hub
    shuffle-skew guard shared with PageRank/LPA, plans.skew). With
    ``broadcast_labels`` (und cached dst-partitioned,
    operators.iterative.prepare_undirected) the join and the dst-keyed
    min both run without exchanging the edge frame.

    ``self_rows``: ``und_j`` carries synthetic (v, v) rows (prepare's
    default), so each vertex's OWN component flows through the join and
    min(own, neighbors) IS the aggregate — the round is join + one
    aggregation, no finalize join, one output row per vertex.

    ``und_j`` may be the ``PreparedUnd`` itself — then salt_plan /
    broadcast_labels / self_rows are taken from it and must not be passed
    (operators.iterative.resolve_round_args, ADVICE r4 #3)."""
    from graphsetintersection_spark.operators.iterative import (
        resolve_round_args,
        state_join,
    )
    from graphsetintersection_spark.plans.skew import two_stage_agg

    und_j, salt_plan, broadcast_labels, self_rows = resolve_round_args(
        und_j, salt_plan, broadcast_labels, self_rows
    )
    joined = state_join(und_j, labels, broadcast_labels)
    if salt_plan is not None:
        nbr_min = two_stage_agg(
            joined.withColumnRenamed("dst", "v"),
            ["v"],
            F.min("component"),
            F.min,
            salt_from="src",
            salts=salt_plan.salts,
            out_col="nbr_min",
        )
    else:
        nbr_min = joined.groupBy(F.col("dst").alias("v")).agg(
            F.min("component").alias("nbr_min")
        )
    if self_rows:
        return nbr_min.withColumnRenamed("nbr_min", "component")
    return labels.join(nbr_min, "v", "left").select(
        "v",
        F.least(
            F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
        ).alias("component"),
    )


def connected_components_minlabel(
    edges: DataFrame,
    max_rounds: int = 50,
    checkpointer: CheckpointManager | None = None,
    salt_hubs: str | int | None = "auto",
) -> ComponentsResult:
    """Synchronous min-label propagation.

    Convergence is detected with ONE aggregate per round — the
    (count, bit_xor) content signature of the materialized label frame
    (plans.skew.content_signature) — instead of a join of consecutive
    label vectors (a full extra shuffle per round). ``salt_hubs`` enables
    two-stage salted aggregation of the per-round neighbor-min for
    Zipf-hub dst keys; "auto" probes skew only on graphs large enough for
    it to matter (plans.skew.decide_hub_salting)."""
    from graphsetintersection_spark.plans.skew import content_signature

    from graphsetintersection_spark.operators.iterative import (
        prepare_undirected,
    )

    spark = edges.sparkSession
    prep = prepare_undirected(edges, salt_hubs=salt_hubs)
    verts = prep.verts

    labels = verts.select("v", F.col("v").alias("component"))
    start = 0
    if checkpointer is not None:
        restored = checkpointer.restore(spark)
        if restored is not None:
            start, labels = restored
            start += 1
    sig_old = content_signature(labels, "v", "component")

    converged = False
    rounds = start
    prev_snapshot: DataFrame | None = None  # superseded localCheckpoint
    for rounds in range(start, max_rounds):
        new_labels = cc_minlabel_round(prep, labels)
        # materialize FIRST (lineage truncation), then one aggregate over
        # the materialized frame decides convergence — no per-round
        # changed-count join-shuffle
        if checkpointer is None:
            new_labels = new_labels.localCheckpoint(eager=True)
        sig_new = content_signature(new_labels, "v", "component")
        changed = sig_new != sig_old
        sig_old = sig_new
        if checkpointer is not None:
            new_labels = checkpointer.commit(
                new_labels, rounds, metrics={"changed": bool(changed)}
            )
        if prev_snapshot is not None:
            prev_snapshot.unpersist()
        prev_snapshot = new_labels
        labels = new_labels
        if not changed:
            converged = True
            rounds += 1
            break
    else:
        rounds = max_rounds

    prep.unpersist()
    return ComponentsResult(labels, rounds, converged)


def _large_star(pairs: DataFrame) -> DataFrame:
    """For each node u (over symmetric pairs), connect every strictly-larger
    neighbor to m = min(N(u) ∪ {u}).

    The output is NOT deduplicated: the consumer (small-star, whose round
    output ends in a distinct anyway) is duplicate-insensitive — its
    groupBy-min ignores duplicates and its final distinct collapses them —
    so the intermediate exchange a distinct would cost here buys nothing
    (guide §2.4: a distinct on data whose consumer dedupes is an
    accidental shuffle)."""
    m = pairs.groupBy("u").agg(
        F.least(F.min("w"), F.first("u")).alias("m")
    )
    return (
        pairs.join(m, "u")
        .where(F.col("w") > F.col("u"))
        .select(F.col("w").alias("u"), F.col("m").alias("w"))
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """For each node u, connect every neighbor ≤ u (and u itself) to
    m = min(N≤(u) ∪ {u})."""
    small = pairs.where(F.col("w") <= F.col("u"))
    m = small.groupBy("u").agg(F.min("w").alias("m"))
    out = (
        small.join(m, "u")
        .select(F.col("w").alias("u"), F.col("m").alias("w"))
        .union(m.select(F.col("u"), F.col("m").alias("w")))
        .where(F.col("u") != F.col("w"))
        .distinct()
    )
    return out


def connected_components_starcontraction(
    edges: DataFrame,
    max_rounds: int = 30,
    checkpointer: CheckpointManager | None = None,
) -> ComponentsResult:
    """Alternating large-star/small-star until the edge set is a stable
    star forest; then component(v) = its root, roots map to themselves."""
    spark = edges.sparkSession
    e = canonicalize(edges)

    start = 0
    pairs = None
    verts = None
    if checkpointer is not None:
        restored = checkpointer.restore(spark)
        if restored is not None:
            start, pairs = restored
            start += 1
    if pairs is None:
        # symmetric neighbor pairs (u, w), materialized ONCE (eager
        # localCheckpoint): round 0 references this frame four times
        # (groupBy-min + join in each star) and the convergence signature
        # once more — unchecked, each reference re-ran the full edges
        # scan + union + distinct (guide §2.4). The leaf also serves as
        # the original vertex set for the final compose, replacing a
        # fresh vertices(e) scan.
        pairs = (
            e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
            .union(e.select(F.col("dst").alias("u"), F.col("src").alias("w")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        verts = pairs.select(F.col("u").alias("v")).distinct()

    converged = False
    rounds = start
    # convergence signature: (row count, order-insensitive XOR checksum) of
    # the distinct parent set — ONE aggregate on the frame being
    # materialized anyway, replacing the exceptAll set-difference (a full
    # extra shuffle per round). Shared helper: plans.skew.content_signature.
    from graphsetintersection_spark.plans.skew import content_signature

    sig_old = content_signature(pairs, "u", "w")
    prev_snapshot: DataFrame | None = None  # superseded localCheckpoint
    for rounds in range(start, max_rounds):
        # large-star operates on symmetric neighborhoods (Kiveris alg. 2);
        # its output edges always point larger→smaller, which is exactly
        # the orientation small-star consumes (alg. 3). The initial pairs
        # frame is already symmetric; later rounds hold strictly
        # larger→smaller rows, so the union with the swap is disjoint and
        # needs no distinct. (A checkpoint restore resumes with the
        # larger→smaller orientation, so only literal round 0 skips it.)
        if rounds == 0:
            sym = pairs
        else:
            sym = pairs.union(
                pairs.select(F.col("w").alias("u"), F.col("u").alias("w"))
            )
        ls = _large_star(sym)
        ss = _small_star(ls)
        # materialize ONCE (the round's only copy), then run the
        # convergence signature as one cheap aggregate over the cached
        # leaf — the previous shape staged a persist AND a localCheckpoint
        # (two full copies of the pairs frame per round) just to feed the
        # same aggregate
        if checkpointer is not None:
            staged = ss.persist()
            sig_new = content_signature(staged, "u", "w")
            delta = 0 if sig_new == sig_old else max(abs(sig_new[0] - sig_old[0]), 1)
            new_pairs = checkpointer.commit(
                staged, rounds, metrics={"delta_edges": int(delta)}
            )
            staged.unpersist()
        else:
            new_pairs = ss.localCheckpoint(eager=True)
            sig_new = content_signature(new_pairs, "u", "w")
            delta = 0 if sig_new == sig_old else max(abs(sig_new[0] - sig_old[0]), 1)
        sig_old = sig_new
        if prev_snapshot is not None:
            prev_snapshot.unpersist()
        prev_snapshot = new_pairs if checkpointer is None else None
        pairs = new_pairs
        if delta == 0:
            converged = True
            rounds += 1
            break
    else:
        rounds = max_rounds

    # pairs is now a star forest: (child, root). Roots self-map; isolated-in
    # -graph vertices (none after canonicalize) and singleton roots included
    if verts is None:  # checkpoint-restored run — original leaf unavailable
        verts = vertices(e)
    comp = verts.join(
        pairs.select(F.col("u").alias("v"), F.col("w").alias("parent")),
        "v",
        "left",
    ).select("v", F.coalesce("parent", F.col("v")).alias("component"))
    return ComponentsResult(comp, rounds, converged)


def connected_components_auto(
    edges: DataFrame,
    probe_rounds: int = 8,
    max_rounds: int = 30,
    salt_hubs: str | int | None = "auto",
) -> ComponentsResult:
    """Strategy-auto connected components (VERDICT r4 next-round #7).

    Min-label converges in O(diameter) rounds and each round is one
    map-side-combinable ``min`` aggregate — it wins outright on
    low-diameter web graphs (sf0.1 bench: 4s vs star contraction's 10s).
    Star contraction converges in O(log² n) rounds on ANY graph — the
    insurance for high-diameter strays (long link chains, crawler traps).
    This entry point gives callers the right algorithm without reading
    the docstrings:

    1. PROBE: run min-label for ``probe_rounds`` (default 8 ≈ the
       effective diameter of web graphs). If the content signature went
       stationary, that result is exact — done (the common case).
    2. FALLBACK: otherwise the diameter exceeded the probe, so KEEP the
       probe's progress — contract the graph to its partial labels
       (label(v) is always in v's component, so the contracted
       label-graph has identical component structure and min ids) — and
       finish with star contraction on the contracted graph, which is
       strictly smaller: every ≤probe-radius neighborhood has already
       collapsed to one vertex. Final components compose the two maps.

    Exactness: component id = min vertex id in the component, identical
    to both underlying implementations (their parity is pytest-pinned).
    """
    pre = connected_components_minlabel(
        edges, max_rounds=probe_rounds, salt_hubs=salt_hubs
    )
    if pre.converged:
        return pre
    lab = pre.components  # (v, component) — partial, component ∈ component(v)
    contracted = (
        canonicalize(edges)
        .join(lab.select(F.col("v").alias("src"), F.col("component").alias("_cs")), "src")
        .join(lab.select(F.col("v").alias("dst"), F.col("component").alias("_cd")), "dst")
        .where(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .distinct()
        # materialize ONCE: star contraction's round 0 references its
        # input several times (groupBy-min + join in each of large-star /
        # small-star), and Spark does not dedupe common subtrees — an
        # unchecked plan would re-run the edges scan + both label joins
        # 3-4×. localCheckpoint also truncates the lineage so the rounds
        # replan from a leaf (same discipline as the iterative rounds).
        .localCheckpoint(eager=True)
    )
    star = connected_components_starcontraction(contracted, max_rounds=max_rounds)
    roots = star.components.select(
        F.col("v").alias("component"), F.col("component").alias("_root")
    )
    # labels whose contracted vertex had no cross-label edge are their own
    # (already-converged) component — the left join's null branch
    final = lab.join(roots, "component", "left").select(
        "v", F.coalesce("_root", F.col("component")).alias("component")
    )
    return ComponentsResult(
        final, pre.rounds + star.rounds, star.converged
    )

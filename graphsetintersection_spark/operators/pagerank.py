"""PageRank as an iterative DataFrame job.

Semantics (textbook power iteration with damping + dangling-mass
redistribution, per the north rule; the reference repo supplies the graph
data model and the set-kernel substrate, not PageRank itself):

    r_{t+1}(v) = (1-α)/N + α · ( Σ_{u→v} r_t(u)/outdeg(u) + D_t/N )
    D_t        = Σ_{outdeg(u)=0} r_t(u)          (dangling mass)
    r_0(v)     = 1/N  over all N distinct vertices

Execution shape per iteration (2 shuffles):
    shares   = ranks ⋈ edges on src          (hash join; AQE skew-split)
    contribs = shares.groupBy(dst).sum       (map-side partial agg — the
               built-in equivalent of salted two-stage aggregation for
               Zipf-hub dst keys)
    ranks    = vertices ⟕ contribs + closed-form dangling/teleport terms

The edges-with-outdeg frame is materialized ONCE (degree join hoisted out
of the loop). Each iteration optionally commits a checkpoint snapshot
(plans.checkpoint) → plan lineage stays O(1) and any run resumes from the
last committed iteration.

Convergence: l∞(r_{t+1} - r_t) < tol, evaluated as one aggregate on the
join of consecutive rank vectors. Scores are float64; the north rule's
allclose(1e-6) is exactly the tolerance class this reproduces under
varying partitioning (float sums reassociate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsetintersection_spark.operators.edges import canonicalize
from graphsetintersection_spark.plans.checkpoint import CheckpointManager


@dataclass
class PageRankResult:
    ranks: DataFrame  # (v: long, rank: double)
    iterations: int
    converged: bool
    deltas: list = field(default_factory=list)


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-8,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    dedup: bool = True,
    broadcast_ranks: bool | None = None,
    salt_hubs: int | str | None = "auto",
) -> PageRankResult:
    """Run PageRank to convergence (or ``max_iter``). ``tol=None`` runs a
    fixed iteration count (used for oracle parity). Resumes automatically
    from ``checkpointer``'s last committed iteration if present.

    ``salt_hubs``: explicit two-stage salted aggregation of contributions
    for high-in-degree dst keys (the north rule's "salted hubs"). Only
    active on the SHUFFLE path — in broadcast mode the contribution
    aggregation is already exchange-free (edges stationary by dst), so
    salting would add cost for nothing. "auto" enables S=16 salts when the
    in-degree distribution is skewed; an int forces that salt count."""
    prep = pagerank_df_prepare(
        edges,
        dedup=dedup,
        broadcast_ranks=broadcast_ranks,
        salt_hubs=salt_hubs,
    )
    try:
        return pagerank_df_iterate(
            prep,
            alpha=alpha,
            max_iter=max_iter,
            tol=tol,
            checkpointer=checkpointer,
            checkpoint_every=checkpoint_every,
        )
    finally:
        prep.unpersist()


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-8,
    weight_col: str | None = None,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    dedup: bool = True,
    broadcast_ranks: bool | None = None,
    salt_hubs: int | str | None = "auto",
) -> PageRankResult:
    """Personalized PageRank: random walks restart at the SEED set instead
    of uniformly — the standard link-graph primitive for topical ranking,
    seed-based spam scoring, and related-page retrieval (r' = (1−α)·p +
    α·(Aᵀr/outdeg + D·p), p supported on the seeds).

    ``seeds``: a DataFrame with a ``v`` column (optionally ``weight_col``
    for a non-uniform restart). Duplicate seed rows sum their weight;
    seeds absent from the graph are dropped and the surviving weights
    renormalized to Σp = 1 (raises if none survive). Same engine as
    ``pagerank``: one prepared, cached, degree-annotated edge frame; the
    broadcast-state exchange-free rounds below the 10M-vertex cutover and
    the salted shuffle path above it; per-iteration lineage truncation;
    checkpoint/resume."""
    prep = pagerank_df_prepare(
        edges,
        dedup=dedup,
        broadcast_ranks=broadcast_ranks,
        salt_hubs=salt_hubs,
    )
    try:
        w = (
            F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
        ).alias("w")
        s = (
            seeds.select(F.col("v").cast("long").alias("v"), w)
            .groupBy("v")
            .agg(F.sum("w").alias("w"))
            .join(prep.verts, "v")  # only seeds that exist in the graph
        )
        row = s.agg(
            F.sum("w").alias("t"), F.min("w").alias("mn")
        ).collect()[0]
        tot = float(row["t"] or 0.0)
        # inverted comparisons so NaN weights fail too (NaN makes every
        # direct comparison False — a NaN total would otherwise slip past
        # `tot <= 0` and return a silently all-NaN rank vector)
        if row["mn"] is not None and not (float(row["mn"]) >= 0.0):
            raise ValueError(
                "personalized_pagerank: seed weights must be non-negative "
                "(and not NaN)"
            )
        if not (tot > 0.0):
            raise ValueError(
                "personalized_pagerank: no seed vertices present in the "
                "graph (or zero total seed weight)"
            )
        tp = s.select("v", (F.col("w") / F.lit(tot)).alias("p"))
        return pagerank_df_iterate(
            prep,
            alpha=alpha,
            max_iter=max_iter,
            tol=tol,
            checkpointer=checkpointer,
            checkpoint_every=checkpoint_every,
            teleport=tp,
        )
    finally:
        prep.unpersist()


@dataclass
class PreparedDFGraph:
    """Stationary state for the DataFrame power iteration: vertex set
    (``verts`` carries a ``_dang`` no-out-edges flag — the per-iteration
    dangling-mass aggregate filters on it), vertex count, the
    degree-annotated edge cache, and the join strategy."""

    verts: DataFrame
    n: int
    e_deg: DataFrame
    broadcast_ranks: bool
    salt_s: int | None

    def unpersist(self) -> None:
        # blocking: the caches are multi-GB at bench scale — an async drop
        # races the next run's memory demand
        self.verts.unpersist(blocking=True)
        self.e_deg.unpersist(blocking=True)


def pagerank_df_prepare(
    edges: DataFrame,
    dedup: bool = True,
    broadcast_ranks: bool | None = None,
    salt_hubs: int | str | None = "auto",
) -> PreparedDFGraph:
    """One-time index build for the DataFrame path: canonicalize, vertex
    set, degree-annotated edges repartitioned for the chosen join strategy
    and cached. Separated from the loop so repeated runs (and the scaling
    bench) pay it once per graph — the analog of the reference's printed
    index-build phase (src/tc.cpp:28-29)."""
    # transient cache for the SETUP phase only: the canonicalized frame
    # feeds the degree/vertex aggregate and the e_deg build — uncached,
    # that is repeated full scans of the raw edge input (guide §2.4: the
    # 100 TB scan is the cost; locally it re-ran the lineitem distinct
    # per pass). Released once e_deg holds its own copy. An input the
    # CALLER already cached (or checkpointed) needs no second copy: its
    # scans are cache reads, and the extra persist is a pure
    # materialization barrier (the same already-cached check the
    # triangle planner and _bfs_levels apply).
    e = canonicalize(edges) if dedup else edges.select("src", "dst")
    e_cached_here = not edges.is_cached
    if e_cached_here:
        e = e.persist()

    # ONE union + aggregate yields the complete vertex set AND each
    # vertex's out-degree (dst-only vertices fall out with out_deg 0) —
    # replacing the previous vertices-distinct + out-degree aggregate +
    # left join (two Exchanges and a join for the same information,
    # guide §2.4). V-row transient cache: feeds both the dangling-flagged
    # vertex set and the e_deg join.
    vdeg = (
        e.select(F.col("src").alias("v"), F.lit(1).alias("_o"))
        .unionAll(e.select(F.col("dst").alias("v"), F.lit(0)))
        .groupBy("v")
        .agg(F.sum("_o").cast("long").alias("out_deg"))
        .persist()
    )
    try:
        return _pagerank_df_prepare_body(
            e, vdeg, broadcast_ranks, salt_hubs
        )
    finally:
        # the setup caches must not outlive this call on ANY exit path
        # (unpersist is idempotent); when the input was already cached,
        # `e` is an uncached projection of the CALLER's cache — nothing
        # to release (and unpersisting it would not touch the caller's)
        if e_cached_here:
            e.unpersist()
        vdeg.unpersist()


def _pagerank_df_prepare_body(e, vdeg, broadcast_ranks, salt_hubs):
    # vertex set annotated with the dangling flag (no out-edges): the
    # iteration's dangling-mass term D = Σ_{dang} rank is then one
    # filter-aggregate over the rank leaf — no per-iteration join against
    # a dangling-vertex table and no Σcontrib second pass (guide §2.4)
    out_deg = vdeg.where(F.col("out_deg") > 0)
    verts = vdeg.select("v", (F.col("out_deg") == 0).alias("_dang")).persist()
    n = verts.count()
    # ranks-side join strategy: while the rank vector fits comfortably in
    # executor memory it is BROADCAST each iteration and the edge table is
    # hash-partitioned by dst — then the contribution aggregation needs NO
    # exchange at all (already co-located on its grouping key): zero
    # per-iteration shuffle, the edges stay stationary. The cutover is
    # ~10M vertices (a rank row is ~16B + row overhead → a few hundred MB
    # broadcast, the practical executor-memory ceiling); beyond it, edges
    # partition by src (Catalyst-visible), only ranks shuffles for the
    # join, and the dst aggregation is the one remaining exchange — the
    # standard ship-vertex-state iterative-graph strategy either way.
    if broadcast_ranks is None:
        broadcast_ranks = n <= 10_000_000

    # salted-hub decision (shuffle path only): mark dst vertices whose
    # in-degree dominates; their contribution rows are pre-aggregated
    # under S salts so no single reducer sums a whole hub alone. Shared
    # probe/marking with CC and LPA: plans.skew.
    from graphsetintersection_spark.plans.skew import decide_hub_salting, mark_hubs

    salt_s: int | None = None
    plan = None
    if not broadcast_ranks and salt_hubs and n:
        if salt_hubs == "auto":
            plan = decide_hub_salting(e, "dst")
        else:
            plan = decide_hub_salting(e, "dst", salts=int(salt_hubs), force=True)
        salt_s = plan.salts if plan is not None else None

    e_deg = e.join(out_deg.withColumnRenamed("v", "src"), "src")
    if plan is not None:
        e_deg = mark_hubs(e_deg, "dst", plan)
    if broadcast_ranks:
        # broadcast path: append one synthetic (v, v, out_deg=null) row per
        # vertex, carrying the vertex's dangling flag. The per-iteration
        # dst aggregation then emits a row for EVERY vertex (the self row's
        # rank/null term is null — skipped by sum — and max(_dang) reads
        # the flag off the single self row), so the per-iteration
        # verts ⟕ contribs finalize join disappears and the round is
        # join-broadcast → one exchange-free aggregation → project
        # (guide §2.4). The shuffle path keeps the proven salted round
        # shape unchanged and skips the extra rows.
        e_deg = e_deg.withColumn(
            "_dang", F.lit(None).cast("boolean")
        ).unionByName(
            verts.select(
                F.col("v").alias("src"),
                F.col("v").alias("dst"),
                F.lit(None).cast("long").alias("out_deg"),
                "_dang",
            )
        ).repartition("dst")
    else:
        # shuffle path: cache hash(src)-partitioned AND src-sorted so the
        # per-iteration sort-merge join sorts only the (small) rank side —
        # the cached edge side satisfies the SMJ ordering for free
        e_deg = e_deg.repartition("src").sortWithinPartitions("src")
    e_deg = e_deg.persist()
    if n:
        e_deg.count()  # materialize once
    return PreparedDFGraph(verts, n, e_deg, broadcast_ranks, salt_s)


def pagerank_df_iterate(
    prep: PreparedDFGraph,
    alpha: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-8,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    teleport: DataFrame | None = None,
) -> PageRankResult:
    """The DataFrame power-iteration loop over a PreparedDFGraph.

    ``teleport`` (v, p) generalizes the restart distribution: with None
    (the default) every vertex teleports uniformly (classic PageRank);
    with a normalized vector (Σp = 1) the jump — and the dangling-mass
    redistribution — lands on p instead, i.e. personalized PageRank:
    r' = (1−α)·p + α·(Aᵀr/outdeg + D·p). Rank mass stays conserved
    (Σr' = (1−α) + α·(Σcontrib + D) = 1), so the same D = 1 − Σcontrib
    dangling trick applies verbatim."""
    spark = prep.e_deg.sparkSession
    verts, n, e_deg = prep.verts, prep.n, prep.e_deg
    broadcast_ranks, salt_s = prep.broadcast_ranks, prep.salt_s
    if n == 0:
        empty = spark.createDataFrame([], "v long, rank double")
        return PageRankResult(empty, 0, True)

    vp = verts
    if teleport is not None:
        # vertex-aligned restart vector, materialized ONCE (it is joined
        # every iteration; localCheckpoint keeps the per-round plan a
        # leaf and its blocks are reference-tracked for release)
        vp = (
            verts.join(teleport, "v", "left")
            .select("v", F.coalesce(F.col("p"), F.lit(0.0)).alias("p"))
            .localCheckpoint(eager=True)
        )

    start_iter = 0
    if teleport is not None:
        # the broadcast round also carries p ON the rank vector so the
        # per-iteration restart needs no vp join (the self rows surface
        # p(dst) through the aggregation)
        if broadcast_ranks:
            ranks = vp.select("v", F.col("p").alias("rank"), "p")
        else:
            ranks = vp.select("v", F.col("p").alias("rank"))
    else:
        cols = ["v", F.lit(1.0 / n).alias("rank")]
        ranks = verts.select(*cols, "_dang") if broadcast_ranks else verts.select(*cols)
    if checkpointer is not None:
        restored = checkpointer.restore(spark)
        if restored is not None:
            start_iter, ranks = restored
            start_iter += 1
    if broadcast_ranks and "_dang" not in ranks.columns:
        # the broadcast round carries the dangling flag ON the rank vector
        # (one boolean per row) so the per-iteration dangling-mass
        # aggregate needs no join; attach it once (initial vectors and
        # restored checkpoints may start without it)
        keep = ["v", "rank"] + (["p"] if "p" in ranks.columns else [])
        ranks = ranks.join(verts, "v").select(*keep, "_dang")
    if (
        broadcast_ranks
        and teleport is not None
        and "p" not in ranks.columns
    ):
        # restored checkpoints predate the carried column — reattach once
        ranks = ranks.join(vp, "v").select("v", "rank", "_dang", "p")

    # Per round: the contribution vector is cached transiently (one
    # execution feeds both the Σcontrib scalar and the new rank view), the
    # dangling mass is D = 1 − Σcontribs (rank mass is conserved, Σr = 1 —
    # algebraically identical to summing dangling vertices' ranks, and one
    # fewer pass over the rank vector), and the new rank vector is
    # materialized WITH lineage truncation (localCheckpoint / durable
    # snapshot commit) so the logical plan stays O(1) across iterations.
    converged = False
    deltas: list[float] = []
    it = start_iter
    prev_snapshot: DataFrame | None = None  # superseded localCheckpoint
    for it in range(start_iter, max_iter):
        if broadcast_ranks:
            # OPTIMIZED BROADCAST ROUND (guide §2.4 — remove shuffles and
            # passes outright). The self rows in e_deg make the dst
            # aggregation total (one row per vertex; the self row's
            # rank/null term is skipped by sum, and it carries nothing
            # else), so no verts ⟕ contribs finalize join. The dangling
            # mass D = Σ_{outdeg=0} rank — the oracle's own form — is one
            # filter-aggregate over the previous rank leaf folded in as a
            # 1-row broadcast, so contribs is referenced exactly ONCE: no
            # per-iteration transient cache, no Σcontrib second pass.
            # (Previously: contribs.persist + Σcontrib aggregate + vp left
            # join + unpersist — 2 extra passes and cache churn per round.)
            src_cols = [F.col("v").alias("src"), F.col("rank")]
            aggs = [
                F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"),
                # exactly one self row per group carries the flag; real
                # rows carry null, which max ignores
                F.max("_dang").alias("_dang"),
            ]
            out_cols = ["v", None, "_dang"]  # None := rank goes here
            if teleport is not None:
                src_cols.append(F.col("p"))
                # the self row (out_deg null) joins the dst vertex's own
                # broadcast row, so its p IS p(dst)
                aggs.append(
                    F.max(
                        F.when(F.col("out_deg").isNull(), F.col("p"))
                    ).alias("p")
                )
                out_cols.append("p")
            ranks_src = F.broadcast(ranks.select(*src_cols))
            contribs = (
                e_deg.join(ranks_src, "src")
                .groupBy(F.col("dst").alias("v"))
                .agg(*aggs)
            )
            dm_df = ranks.where(F.col("_dang")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            if teleport is not None:
                restart = (
                    F.lit(1.0 - alpha) * F.col("p")
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dm") * F.col("p")
                    )
                )
                body = contribs
            else:
                restart = (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                )
                body = contribs
            new_ranks = body.crossJoin(F.broadcast(dm_df)).select(
                *[restart.alias("rank") if c is None else c for c in out_cols]
            )
            contribs_cache = None
        else:
            ranks_src = ranks.withColumnRenamed("v", "src")
            joined = e_deg.join(ranks_src, "src")
            term = F.col("rank") / F.col("out_deg")
            if salt_s:
                # two-stage salted aggregation (plans.skew.two_stage_agg):
                # hub dst rows split across salt_s sub-keys (deterministic
                # salt from src) so the first shuffle spreads each hub over
                # S reducers; the second stage sums at most S rows per hub.
                from graphsetintersection_spark.plans.skew import two_stage_agg

                contribs = two_stage_agg(
                    joined.withColumnRenamed("dst", "v"),
                    ["v"],
                    F.sum(term),
                    F.sum,
                    salt_from="src",
                    salts=salt_s,
                    out_col="contrib",
                ).persist()
            else:
                contribs = (
                    joined.groupBy(F.col("dst").alias("v"))
                    .agg(F.sum(term).alias("contrib"))
                    .persist()
                )
            contribs_cache = contribs
            # dangling mass D = 1 − Σcontribs folded into the plan as a
            # 1-row broadcast over the SAME transient cache — no extra
            # driver action; the single materialization below executes
            # contribs exactly once
            tot_df = contribs.agg(
                F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("_tot")
            )
            if teleport is not None:
                restart = (
                    F.lit(1.0 - alpha) * F.col("p")
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("_tot")) * F.col("p")
                    )
                )
            else:
                # kept byte-for-byte as the uniform formula (not folded
                # into the teleport expression with p = 1/n): the gate
                # hashes rank_ppm against a DuckDB oracle, and a different
                # float association could flip a .5-boundary rounding
                restart = (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("_tot")) / F.lit(float(n))
                    )
                )
            new_ranks = (
                vp.join(contribs, "v", "left")
                .crossJoin(F.broadcast(tot_df))
                .select("v", restart.alias("rank"))
            )

        # materialize + TRUNCATE lineage every iteration: localCheckpoint
        # (or the durable snapshot commit) replaces the logical plan with a
        # leaf — without this, each round's analyzed plan nests the whole
        # history and the driver's analyzer eventually exhausts the heap.
        if checkpointer is not None and (it % checkpoint_every == 0 or it == max_iter - 1):
            pre_commit = new_ranks
            new_ranks = None
        else:
            new_ranks = new_ranks.localCheckpoint(eager=True)

        delta = None
        if tol is not None:
            target = new_ranks if new_ranks is not None else pre_commit
            delta = (
                target.withColumnRenamed("rank", "new_rank")
                .join(ranks, "v")
                .agg(F.max(F.abs(F.col("new_rank") - F.col("rank"))))
                .collect()[0][0]
            )
            deltas.append(float(delta))

        if new_ranks is None:
            new_ranks = checkpointer.commit(
                pre_commit,
                it,
                metrics={"delta": float(delta) if delta is not None else None,
                         "n_vertices": n},
            )

        # new_ranks is now self-contained; the contribs cache can go, and
        # the PREVIOUS iteration's localCheckpoint blocks are superseded —
        # drop them so long runs don't accumulate cached rank snapshots.
        # Tracked for EVERY iteration (also the non-commit ones between
        # sparse checkpoints — checkpoint_every > 1 would otherwise leak a
        # localCheckpoint per skipped commit); unpersist on a durable
        # commit's read-back frame is a harmless no-op.
        if contribs_cache is not None:
            contribs_cache.unpersist()
        if prev_snapshot is not None:
            prev_snapshot.unpersist()
        prev_snapshot = new_ranks
        ranks = new_ranks
        if tol is not None and delta is not None and delta < tol:
            converged = True
            it += 1
            break
    else:
        it = max_iter

    # the broadcast rounds carry the internal _dang flag on the rank
    # vector; the public result is (v, rank)
    return PageRankResult(ranks.select("v", "rank"), it, converged, deltas)


@dataclass
class PreparedGraph:
    """Stationary state for the kernel power iteration: the cached dense-id
    edge blocks, the out-degree vector, and the id mapping (None when ids
    were already dense)."""

    blocks: DataFrame
    outdeg: "object"      # np.ndarray (n,)
    n: int
    order: DataFrame | None

    def unpersist(self) -> None:
        self.blocks.unpersist()
        if self.order is not None:
            self.order.unpersist()


def pagerank_kernel_prepare(edges: DataFrame, relabel: bool = True) -> PreparedGraph:
    """One-time index build for ``pagerank_kernel_iterate`` — the analog of
    the reference's index-build phase (src/tc.cpp:28-29): canonicalize,
    densify ids (two-phase relabel), cache the edge blocks, collect the
    out-degree vector."""
    import numpy as np

    spark = edges.sparkSession
    e = canonicalize(edges)
    order = None
    if relabel:
        from graphsetintersection_spark.operators.relabel import (
            apply_order,
            continuous_ids,
        )

        order = continuous_ids(e).persist()
        n = order.count()
        dense = apply_order(e, order)
    else:
        mx = e.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]
        n = int(mx) + 1 if mx is not None else 0
        dense = e
    # hash-partition by dst ONCE: each partition then owns its dst range,
    # so every iteration's per-partition bincount emits only that
    # partition's vertices (total collect ≈ V rows/iteration, not P×V)
    blocks = (
        dense.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .repartition("dst")
        .persist()
    )
    blocks.count()
    outdeg = np.zeros(max(n, 1), dtype=np.float64)
    if n:
        out_pdf = blocks.groupBy("src").agg(F.count("*").alias("d")).toPandas()
        outdeg[out_pdf["src"].to_numpy(dtype=np.int64)] = out_pdf[
            "d"
        ].to_numpy(dtype=np.float64)
    return PreparedGraph(blocks, outdeg, n, order)


def pagerank_kernel_iterate(
    prep: PreparedGraph,
    alpha: float = 0.85,
    max_iter: int = 20,
    tol: float | None = None,
):
    """(rank_vector, iterations, converged, deltas) — the pure iteration
    loop over a PreparedGraph. Each iteration: one ~8B/vertex broadcast,
    one mapInArrow bincount job over the cached blocks, one ~16B/vertex
    partial collect. No shuffle."""
    import numpy as np

    sc = prep.blocks.sparkSession.sparkContext
    n = prep.n
    if n == 0:
        return np.empty(0), 0, True, []
    dangling_mask = prep.outdeg == 0.0
    safe_out = np.where(dangling_mask, 1.0, prep.outdeg)
    ranks_vec = np.full(n, 1.0 / n, dtype=np.float64)
    converged = False
    deltas: list[float] = []
    it = 0
    for it in range(max_iter):
        w = np.where(dangling_mask, 0.0, ranks_vec / safe_out)
        bc = sc.broadcast(w)

        def partials(batches, _bc=bc):
            import numpy as np
            import pyarrow as pa

            wv = _bc.value
            for batch in batches:
                src = batch.column(0).to_numpy(zero_copy_only=False)
                dst = batch.column(1).to_numpy(zero_copy_only=False)
                ud, inv = np.unique(dst, return_inverse=True)
                c = np.bincount(inv, weights=wv[src])
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ud, type=pa.int64()),
                     pa.array(c, type=pa.float64())],
                    ["v", "c"],
                )

        part = prep.blocks.mapInArrow(partials, "v long, c double").toPandas()
        contrib = np.bincount(
            part["v"].to_numpy(dtype=np.int64),
            weights=part["c"].to_numpy(dtype=np.float64),
            minlength=n,
        )
        bc.destroy()
        dangling = float(ranks_vec[dangling_mask].sum())
        new_vec = (1.0 - alpha) / n + alpha * (contrib + dangling / n)
        if tol is not None:
            delta = float(np.abs(new_vec - ranks_vec).max())
            deltas.append(delta)
            ranks_vec = new_vec
            if delta < tol:
                converged = True
                it += 1
                break
        else:
            ranks_vec = new_vec
    else:
        it = max_iter
    return ranks_vec, it, converged, deltas


def pagerank_kernel(
    edges: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 20,
    tol: float | None = None,
    relabel: bool = True,
) -> PageRankResult:
    """Broadcast-vector power iteration over stationary cached edge
    partitions — the north star's stated kernel design ("vectorized
    numpy/Arrow kernels inside pandas UDFs over CSR-blocked edge
    partitions, never per-row Python").

    Per iteration: broadcast the weight vector w = rank/outdeg (8 B/vertex),
    one mapInArrow job over the CACHED edge blocks (per Arrow batch:
    ``np.bincount(dst, weights=w[src])`` — one vectorized gather+scatter),
    driver-side assembly of the contribution vector + closed-form
    dangling/teleport terms. NO shuffle at any iteration; the only
    per-iteration serial costs are a ~8B/vertex broadcast and a ~16B/vertex
    partial collect.

    Scope: the rank/out-degree vectors must fit on the driver and each
    executor (~10^8 vertices in a few GB). Beyond that, use ``pagerank``
    (the DataFrame path, which also owns checkpoint/resume). Parity with
    it is allclose-1e-12 (same float64 math, different summation order).

    ``relabel=False`` asserts ids are already dense 0..V-1 and skips the
    continuous-id join."""
    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    prep = pagerank_kernel_prepare(edges, relabel=relabel)
    if prep.n == 0:
        prep.unpersist()
        empty = spark.createDataFrame([], "v long, rank double")
        return PageRankResult(empty, 0, True)
    ranks_vec, it, converged, deltas = pagerank_kernel_iterate(
        prep, alpha=alpha, max_iter=max_iter, tol=tol
    )
    ranks_pdf = pd.DataFrame(
        {"v": np.arange(prep.n, dtype=np.int64), "rank": ranks_vec}
    )
    ranks = spark.createDataFrame(ranks_pdf)
    if prep.order is not None:
        ranks = (
            ranks.withColumnRenamed("v", "new_id")
            .join(prep.order, "new_id")
            .select(F.col("org_id").alias("v"), "rank")
        )
    prep.unpersist()
    return PageRankResult(ranks, it, converged, deltas)

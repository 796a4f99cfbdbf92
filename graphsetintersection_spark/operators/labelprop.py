"""Synchronous label propagation (community detection) — deterministic.

Semantics (synchronous LPA per the north rule; fully deterministic so the
result is exactly reproducible and exactly comparable):

    label_0(v)   = v
    label_{t+1}(v) = the label with the HIGHEST COUNT among v's neighbors'
                     labels at time t, ties broken by SMALLEST label;
                     vertices with no neighbors keep their label.

Each round: one join (labels onto edges) + one count aggregate + one
row_number window partitioned by vertex — all shuffle-on-v, map-side
combinable. Deterministic tie-break makes the fixpoint (or the state after
a fixed number of rounds) exactly equal across engines, which is what the
DuckDB oracle checks. Checkpoint/resume identical to PageRank.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphsetintersection_spark.operators.edges import canonicalize, symmetrize, vertices
from graphsetintersection_spark.plans.checkpoint import CheckpointManager


@dataclass
class LabelPropResult:
    labels: DataFrame  # (v: long, label: long)
    rounds: int
    converged: bool


def lpa_round(und: DataFrame, labels: DataFrame, verts: DataFrame) -> DataFrame:
    """One synchronous LPA round over the symmetrized edge set."""
    nbr_labels = und.join(
        labels.withColumnRenamed("v", "src"), "src"
    ).select(F.col("dst").alias("v"), "label")
    counts = nbr_labels.groupBy("v", "label").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("label").asc())
    best = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("v", "label")
    )
    return verts.join(best.withColumnRenamed("label", "new_label"), "v", "left").join(
        labels, "v"
    ).select("v", F.coalesce("new_label", "label").alias("label"))


def label_propagation(
    edges: DataFrame,
    max_rounds: int = 10,
    fixed_rounds: bool = True,
    checkpointer: CheckpointManager | None = None,
) -> LabelPropResult:
    """``fixed_rounds=True`` runs exactly ``max_rounds`` rounds (oracle
    parity mode — LPA need not converge); False stops early at fixpoint."""
    spark = edges.sparkSession
    und = symmetrize(canonicalize(edges)).persist()
    und.count()
    verts = vertices(und).persist()

    labels = verts.select("v", F.col("v").alias("label"))
    start = 0
    if checkpointer is not None:
        restored = checkpointer.restore(spark)
        if restored is not None:
            start, labels = restored
            start += 1

    converged = False
    rounds = start
    prev_snapshot: DataFrame | None = None  # superseded localCheckpoint
    for rounds in range(start, max_rounds):
        new_labels = lpa_round(und, labels, verts)
        changed = None
        if not fixed_rounds:
            changed = (
                new_labels.withColumnRenamed("label", "nl")
                .join(labels, "v")
                .where(F.col("nl") != F.col("label"))
                .count()
            )
        if checkpointer is not None:
            new_labels = checkpointer.commit(
                new_labels, rounds,
                metrics={"changed": int(changed) if changed is not None else None},
            )
        else:
            new_labels = new_labels.localCheckpoint(eager=True)
        # the previous round's localCheckpoint blocks are superseded
        if prev_snapshot is not None:
            prev_snapshot.unpersist()
        prev_snapshot = new_labels if checkpointer is None else None
        labels = new_labels
        if changed == 0:
            converged = True
            rounds += 1
            break
    else:
        rounds = max_rounds

    und.unpersist()
    verts.unpersist()
    return LabelPropResult(labels, rounds, converged)

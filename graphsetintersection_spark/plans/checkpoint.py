"""Iteration checkpointing with per-partition lineage + metrics.

The north rule requires every iterative algorithm (PageRank, connected
components, label propagation) to be resumable mid-algorithm, with each
iteration persisted as a snapshot carrying per-partition lineage and
metrics. The reference has no notion of this (single-process, in-memory);
in Spark it solves two problems at once:

1. **Plan-lineage truncation** — an iterative DataFrame job otherwise grows
   an unbounded logical plan; writing + reading back each iteration resets
   it (the standard Spark idiom for iterative algorithms).
2. **Resumability** — a killed run restarts from the last COMMITTED
   iteration; commit is atomic via manifest-line-last ordering (the data
   snapshot is fully written before its manifest line appears).

Layout (``storage="parquet"``, the sandbox default — same
snapshot-per-iteration semantics as Iceberg; ``storage="iceberg"`` routes
through ``df.writeTo(...).using("iceberg").createOrReplace()`` against a
configured Iceberg catalog, for clusters that carry the runtime jar):

    <base>/<run_id>/iter=NNNNN/         parquet snapshot
    <base>/<run_id>/MANIFEST.jsonl      one JSON line per committed iter:
        {run_id, algorithm, iteration, parent_iteration, params,
         metrics: {...user metrics...},
         partitions: [{partition_id, rows}, ...]}

With Iceberg, snapshots live at ``<table_prefix>_iter_NNNNN`` and Iceberg
keeps its own table-level manifests; the run-level MANIFEST.jsonl (lineage
+ metrics + resume pointer) is written either way.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(
        self,
        base_dir: str,
        run_id: str,
        algorithm: str = "",
        params: dict[str, Any] | None = None,
        storage: str = "parquet",
        table_prefix: str | None = None,
    ):
        if storage not in ("parquet", "iceberg"):
            raise ValueError(f"unknown checkpoint storage {storage!r}")
        self.dir = os.path.join(base_dir, run_id)
        self.run_id = run_id
        self.algorithm = algorithm
        self.params = params or {}
        self.storage = storage
        # iceberg snapshots are tables, not paths: <prefix>_iter_NNNNN
        self.table_prefix = table_prefix or f"gsi_ckpt_{run_id}"
        self.manifest_path = os.path.join(self.dir, "MANIFEST.jsonl")
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def committed(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def latest_iteration(self) -> int | None:
        entries = self.committed()
        return max((e["iteration"] for e in entries), default=None)

    def _snapshot_path(self, iteration: int) -> str:
        return os.path.join(self.dir, f"iter={iteration:05d}")

    def _snapshot_table(self, iteration: int) -> str:
        return f"{self.table_prefix}_iter_{iteration:05d}"

    def _write_snapshot(self, df: DataFrame, iteration: int) -> DataFrame:
        """Write the snapshot and return it read back (fresh lineage)."""
        spark = df.sparkSession
        if self.storage == "iceberg":
            table = self._snapshot_table(iteration)
            df.writeTo(table).using("iceberg").createOrReplace()
            return spark.read.table(table)
        path = self._snapshot_path(iteration)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def _read_snapshot(self, spark: SparkSession, iteration: int) -> DataFrame:
        if self.storage == "iceberg":
            return spark.read.table(self._snapshot_table(iteration))
        return spark.read.parquet(self._snapshot_path(iteration))

    # -- commit / restore --------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        iteration: int,
        metrics: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Write the iteration snapshot, record per-partition lineage +
        metrics, append the manifest line (commit point), and return the
        read-back DataFrame (fresh lineage — plan growth truncated)."""
        back = self._write_snapshot(df, iteration)
        part_rows = (
            back.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        entry = {
            "run_id": self.run_id,
            "algorithm": self.algorithm,
            "iteration": iteration,
            "parent_iteration": iteration - 1 if iteration > 0 else None,
            "params": self.params,
            "metrics": metrics or {},
            "partitions": sorted(
                ({"partition_id": r["partition_id"], "rows": r["rows"]}
                 for r in part_rows),
                key=lambda d: d["partition_id"],
            ),
        }
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        return back

    def restore(self, spark: SparkSession) -> tuple[int, DataFrame] | None:
        """(iteration, snapshot) of the last committed iteration, or None."""
        it = self.latest_iteration()
        if it is None:
            return None
        return it, self._read_snapshot(spark, it)

    def metrics_history(self) -> list[dict[str, Any]]:
        return [
            {"iteration": e["iteration"], **e["metrics"]} for e in self.committed()
        ]

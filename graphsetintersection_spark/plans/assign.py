"""Distributed global order statistics — two-phase id assignment.

Replaces ``row_number() over (order by ...)`` — which Spark executes as a
single-reducer global window (``WindowExec: No Partition Defined``) — with
the zipWithIndex recipe expressed in DataFrames:

1. range-partition by the order key (Spark's range partitioner samples
   boundaries, so partition *i* holds keys strictly before partition
   *i+1*'s);
2. one tiny job: per-partition row count (and optionally a column sum) —
   P scalar rows collected to the driver;
3. prefix-sum those P counts into per-partition offsets on the driver,
   broadcast-join them back, and rank *within* each partition only
   (``row_number() over (partition by _pid order by ...)``).

Semantics are identical to the global window for any total order;
parallelism is P instead of 1. This is the scalable form of the
reference's permutation assignment (src/porder.cpp:445-495 writes
``org2newid[order[i]] = i`` sequentially; here the same rank is computed
with one range shuffle + a P-row driver prefix sum).

The range-partitioned input is persisted so the partition ids observed by
the count job and by the final ranking job are the same physical blocks
(range-boundary sampling after a shuffle is not replay-stable). The cache
holds only the projected input rows; callers running this inside a loop
should unpersist via the returned DataFrame's lineage when done.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_order_stats(
    df: DataFrame,
    order_exprs: list[Column],
    *,
    rank_col: str | None = None,
    cumsum_of: str | None = None,
    cumsum_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append global-order statistics to ``df`` without a global window.

    ``order_exprs`` must define a TOTAL order (include a tie-break key);
    ``rank_col`` gets the 0-based dense position in that order;
    ``cumsum_col`` gets the inclusive running sum of ``cumsum_of``
    (integer semantics, emitted as bigint).
    """
    if rank_col is None and cumsum_col is None:
        raise ValueError("request at least one of rank_col / cumsum_col")
    if (cumsum_col is None) != (cumsum_of is None):
        raise ValueError("cumsum_col and cumsum_of go together")
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parted = (
        df.repartitionByRange(p, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    if cumsum_of is not None:
        aggs.append(F.sum(cumsum_of).cast("long").alias("_s"))
    stats = {r["_pid"]: r for r in parted.groupBy("_pid").agg(*aggs).collect()}

    rows: list[tuple[int, int, int]] = []
    off_n = off_s = 0
    for pid in sorted(stats):
        rows.append((pid, off_n, off_s))
        off_n += stats[pid]["_n"]
        if cumsum_of is not None:
            off_s += int(stats[pid]["_s"] or 0)
    offsets = spark.createDataFrame(rows, "_pid int, _off_n long, _off_s long")

    out = parted.join(F.broadcast(offsets), "_pid")
    wp = Window.partitionBy("_pid").orderBy(*order_exprs)
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.row_number().over(wp) + F.col("_off_n") - 1).cast("long")
        )
    if cumsum_col is not None:
        wps = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            cumsum_col,
            (F.sum(cumsum_of).over(wps).cast("long") + F.col("_off_s")).cast("long"),
        )
    return out.drop("_pid", "_off_n", "_off_s")

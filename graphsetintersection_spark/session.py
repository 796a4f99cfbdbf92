"""SparkSession factory tuned for the link-graph engine.

Defaults target a single-node ``local[N]`` developer loop but every knob is
chosen to scale to a 1000-executor cluster: AQE on (runtime coalescing +
skew-join splitting), Arrow on (all kernels are pandas/Arrow UDFs),
shuffle partitions sized to cores locally (on a real cluster, set
``spark.sql.shuffle.partitions`` ≈ 2-3× total cores, or leave AQE to
coalesce from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graphsetintersection-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else str(os.cpu_count() or 8)
        shuffle_partitions = max(8, int(n))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow: every kernel in this engine is a pandas/Arrow UDF.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime partition coalescing + skew-join splitting. Web
        # graphs are Zipf-skewed; AQE is the built-in backstop behind our
        # explicit hub salting/broadcast.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Oracle comparison (DuckDB is UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative algorithms checkpoint here to truncate plan lineage.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_min_parallelism(df, target: int | None = None):
    """Raise an under-parallel frame to the session's default parallelism
    before a compute-heavy (Python/Arrow kernel) pass.

    Single-file, single-row-group parquet tables scan as ONE partition, so
    a mapInArrow/mapInPandas kernel placed directly over the scan runs on
    one core while the rest of the cluster idles (guide §2.1/§6: splits
    cannot cross row-group boundaries, so ``maxPartitionBytes`` /
    ``minPartitionNum`` cannot fix this shape). The round-robin exchange
    this inserts moves only the kernel's (already column-pruned) input
    once; at scale, scans arrive with >= target partitions and this is a
    no-op — the partition count is checked, not assumed."""
    if df.isStreaming:
        # a streaming frame cannot be inspected via .rdd (and its
        # per-micro-batch parallelism is the source's concern)
        return df
    sc = df.sparkSession.sparkContext
    if target is None:
        target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver-provided parquet tables."""
    return spark.read.parquet(table_path(sf_dir, name))

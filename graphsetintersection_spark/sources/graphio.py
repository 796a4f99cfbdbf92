"""Graph sources & sinks.

The reference loads/saves whitespace-separated ``u v`` text edge lists with
``#`` comment lines (``src/util.cpp:37-61``, format spec README.md:35-44)
plus 2-column permutation/label files (``src/util.cpp:63-118``,
``src/sm.cpp:45-58``). Here each is a one-line declarative read/write —
Catalyst prunes and pushes down — and the canonical persisted form is
parquet (src,dst), hash-clustered by src so adjacency builds shuffle less.

``lineitem_graph`` is the SQL-exact derived graph used by the correctness
gate: a pseudo-random multigraph over V vertices computed with pure integer
arithmetic from the driver's ``lineitem`` table, so DuckDB can reproduce it
bit-for-bit from the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphsetintersection_spark.session import read_table

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

# Default vertex-universe size of the oracle graph. Small enough that the
# DuckDB recursive-CTE oracles stay tractable at any scale factor; the
# *scale* path of the engine is exercised by the synthetic pages corpus
# (sources.pages), not this graph.
LGRAPH_V = 2000

# Pure-integer-arithmetic edge derivation — identical semantics in Spark SQL
# and DuckDB (non-negative integer %, *, +). Mirrors the reference's
# deterministic random test-graph generation (src/exp/random_data_generator
# .cpp:4-45): multiplicative mixing gives a pseudo-random dense-ish graph
# with triangles.
_LGRAPH_SQL_EXPR = (
    "cast((l_orderkey * 2654435761 + l_linenumber * 40503) % {v} as bigint) as src",
    "cast((l_partkey * 2246822519 + l_suppkey * 3266489917 + l_orderkey) % {v} as bigint) as dst",
)


def lineitem_graph_sql(v: int = LGRAPH_V, table: str = "lineitem") -> str:
    """ANSI-SQL derivation of the oracle graph (runs in Spark AND DuckDB)."""
    s, d = (e.format(v=v) for e in _LGRAPH_SQL_EXPR)
    return f"select {s}, {d} from {table}"


def lineitem_graph(spark: SparkSession, sf_dir: str, v: int = LGRAPH_V) -> DataFrame:
    """Directed edge table derived from lineitem via integer arithmetic."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(lineitem_graph_sql(v))


def load_edge_text(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's on-disk graph format: ``u v`` per line,
    ``#`` comments skipped (src/util.cpp:37-61, README.md:35-44)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.where(~F.col("value").startswith("#"))
        .where(F.trim(F.col("value")) != "")
        .select(
            parts.getItem(0).cast("long").alias("src"),
            parts.getItem(1).cast("long").alias("dst"),
        )
    )


def save_edge_text(edges: DataFrame, path: str) -> None:
    """Write the reference text format (src/util.cpp:93-105)."""
    edges.select(
        F.concat_ws(" ", F.col("src"), F.col("dst")).alias("value")
    ).write.mode("overwrite").text(path)


def save_edges_parquet(edges: DataFrame, path: str, buckets: int | None = None) -> None:
    """Canonical persisted edge table: parquet, repartitioned by src so a
    downstream ``groupBy(src)`` adjacency build reads co-located data."""
    n = buckets or edges.sparkSession.sparkContext.defaultParallelism
    edges.repartition(n, "src").sortWithinPartitions("src", "dst").write.mode(
        "overwrite"
    ).parquet(path)


def load_edges_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_vertex_order(spark: SparkSession, path: str) -> DataFrame:
    """2-column (org_id, new_id) permutation (src/util.cpp:63-91)."""
    df = load_edge_text(spark, path)
    return df.select(F.col("src").alias("org_id"), F.col("dst").alias("new_id"))


def save_vertex_order(order: DataFrame, path: str) -> None:
    """Persist a permutation (src/util.cpp:107-118)."""
    order.select(
        F.concat_ws(" ", F.col("org_id"), F.col("new_id")).alias("value")
    ).write.mode("overwrite").text(path)

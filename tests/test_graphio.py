"""Graph IO: the reference's text edge-list format round-trip, comment
handling (src/util.cpp:37-61), permutation IO (src/util.cpp:63-118),
parquet round-trip with src-clustering."""

from pyspark.sql import functions as F

from graphsetintersection_spark.sources.graphio import (
    load_edge_text,
    load_edges_parquet,
    load_vertex_order,
    save_edge_text,
    save_edges_parquet,
    save_vertex_order,
)


def test_edge_text_roundtrip(spark, tmp_path):
    path = str(tmp_path / "g.txt")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (7, 3)], "src long, dst long"
    )
    save_edge_text(edges, path)
    back = load_edge_text(spark, path)
    assert sorted((r["src"], r["dst"]) for r in back.collect()) == [
        (0, 1), (1, 2), (7, 3),
    ]


def test_edge_text_comments_and_blanks(spark, tmp_path):
    path = str(tmp_path / "raw.txt")
    (tmp_path / "raw.txt").mkdir()
    with open(str(tmp_path / "raw.txt" / "part-0.txt"), "w") as f:
        f.write("# comment line\n0 1\n\n  2   3 \n# more\n4 5\n")
    back = load_edge_text(spark, path)
    assert sorted((r["src"], r["dst"]) for r in back.collect()) == [
        (0, 1), (2, 3), (4, 5),
    ]


def test_vertex_order_roundtrip(spark, tmp_path):
    path = str(tmp_path / "order.txt")
    order = spark.createDataFrame(
        [(10, 0), (20, 1), (30, 2)], "org_id long, new_id long"
    )
    save_vertex_order(order, path)
    back = load_vertex_order(spark, path)
    assert sorted((r["org_id"], r["new_id"]) for r in back.collect()) == [
        (10, 0), (20, 1), (30, 2),
    ]


def test_edges_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "edges_pq")
    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 11) for i in range(100)], "src long, dst long"
    )
    save_edges_parquet(edges, path, buckets=4)
    back = load_edges_parquet(spark, path)
    assert back.count() == 100
    assert sorted((r["src"], r["dst"]) for r in back.collect()) == sorted(
        (r["src"], r["dst"]) for r in edges.collect()
    )

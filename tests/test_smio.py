"""sm/mc file surface: reference-format query/label/answer I/O roundtrips
(src/sm.cpp:15-77, src/org_maximal_clique.cpp:372-385,
python/gen_labels.py, python/gen_queries.py)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from graphsetintersection_spark.operators.matching import (
    LabelSubgraph,
    subgraph_match_count,
)
from graphsetintersection_spark.sources import smio

# triangle query (labels 0,1,2) + single-edge query, reference token format:
# v_num e_num / labels / edges — with a deliberate u>v pair to exercise swap
QUERY_TEXT = """\
3 3
0 1 2
0 1
2 1
0 2
2 1
3 4
0 1
"""


def test_parse_queries_reference_format():
    qs = smio.parse_queries_text(QUERY_TEXT)
    assert len(qs) == 2
    assert qs[0].v_num == 3 and qs[0].labels == [0, 1, 2]
    assert sorted(qs[0].edges) == [(0, 1), (0, 2), (1, 2)]  # (2,1) swapped
    assert qs[1].v_num == 2 and qs[1].edges == [(0, 1)] and qs[1].labels == [3, 4]


def test_query_file_roundtrip(tmp_path):
    p = str(tmp_path / "q.queries")
    qs = smio.parse_queries_text(QUERY_TEXT)
    smio.save_queries(qs, p)
    back = smio.load_queries(p)
    assert [(q.v_num, sorted(q.edges), q.labels) for q in back] == [
        (q.v_num, sorted(q.edges), q.labels) for q in qs
    ]


def _small_labeled_graph(spark):
    # K4 on 0..3 plus pendant 4; labels v % 3
    edges = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(4), 2)] + [(3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(v, v % 3) for v in range(5)], "v long, label int"
    )
    return edges, labels


def test_run_sm_batch_and_answer_file(spark, tmp_path):
    edges, labels = _small_labeled_graph(spark)
    qs = smio.parse_queries_text(QUERY_TEXT)[:1]  # labeled triangle 0-1-2
    ans_path = str(tmp_path / "answers.txt")
    counts = smio.run_sm_batch(edges, labels, qs, answers_path=ans_path)
    # K4 vertices 0,1,2,3 have labels 0,1,2,0 → triangles with labels
    # {0,1,2}: vertex sets {0,1,2} and {1,2,3}; embeddings are ordered maps
    # (one per automorphism-free assignment) = 2
    assert counts == [2]
    assert smio.load_sm_answers(ans_path) == [2]
    with open(ans_path) as f:
        assert f.read() == "ans0=2\n"


def test_labels_roundtrip_and_gen(spark, tmp_path):
    edges, _ = _small_labeled_graph(spark)
    lab = smio.gen_labels(edges, num_labels=7, seed=3)
    assert lab.count() == 5  # vertices 0..max_id
    rng = lab.agg(F.min("label"), F.max("label")).collect()[0]
    assert rng[0] >= 0 and rng[1] < 7
    # determinism
    lab2 = smio.gen_labels(edges, num_labels=7, seed=3)
    assert sorted(map(tuple, lab.collect())) == sorted(map(tuple, lab2.collect()))

    p = str(tmp_path / "labels")
    smio.save_labels(lab, p)
    back = smio.load_labels(edges.sparkSession, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, lab.collect()))


def test_trans_newid_labels(spark):
    labels = spark.createDataFrame(
        [(0, 5), (1, 6), (2, 7)], "v long, label int"
    )
    order = spark.createDataFrame(
        [(0, 2), (1, 0), (2, 1)], "org_id long, new_id long"
    )
    out = smio.trans_newid_labels(labels, order)
    assert sorted(map(tuple, out.collect())) == [(0, 6), (1, 7), (2, 5)]


def test_mc_answers_roundtrip(spark, tmp_path):
    cliques = spark.createDataFrame(
        [([0, 1, 2],), ([3, 4],)], "clique array<long>"
    )
    p = str(tmp_path / "mc_answers")
    smio.save_mc_answers(cliques, p)
    back = smio.load_mc_answers(spark, p)
    got = sorted(tuple(r["clique"]) for r in back.collect())
    assert got == [(0, 1, 2), (3, 4)]


def test_gen_distance_queries(spark):
    edges, _ = _small_labeled_graph(spark)
    bfs = smio.gen_bfs_queries(edges, q_num=10, seed=2)
    assert bfs.count() == 10
    assert bfs.agg(F.max("v")).collect()[0][0] <= 4
    sd = smio.gen_shortest_distance_queries(edges, q_num=10, seed=2)
    assert sd.count() == 10
    r = sd.agg(F.max("u"), F.max("v"), F.min("u"), F.min("v")).collect()[0]
    assert all(0 <= x <= 4 for x in r)


def test_trans_newid_query_ids(spark):
    order = spark.createDataFrame(
        [(0, 2), (1, 0), (2, 1)], "org_id long, new_id long"
    )
    q = spark.createDataFrame([(0, 1), (2, 0)], "u long, v long")
    out = smio.trans_newid_query_ids(q, order, ["u", "v"])
    assert sorted(map(tuple, out.collect())) == [(1, 2), (2, 0)]

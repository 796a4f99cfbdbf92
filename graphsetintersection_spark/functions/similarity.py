"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce`` — exact top-k neighbors; the baseline. Dot
  products as JVM expressions (zip_with + aggregate, strictly sequential
  left-to-right double accumulation → bit-reproducible and SQL-oracle-
  comparable). Query side is broadcast (small); candidates stream.
- ``cosine_topk_kernel``    — the scale path for wide fan-outs: one
  vectorized numpy GEMM per Arrow batch via mapInPandas (queries broadcast
  as a dense matrix; candidates × queries = one matmul per batch), then a
  Spark window top-k. 10-100× the scalar-expression form on real dims.
- ``lsh_ann_topk``          — random-hyperplane (SimHash) LSH-bucketed
  ANN: probe only candidates sharing a hash bucket with the query;
  recall<1 by construction, verified against brute force in tests.
- ``embedding_neardup_pairs`` — all pairs with cosine ≥ threshold (near-
  duplicate detection by embedding).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    """Sequential-order double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    Cross join with the query side broadcast; per-query top-k via window.
    Ties broken by neighbor id asc (deterministic). Self-pairs excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_kernel(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized exact top-k: queries collected to a dense numpy matrix
    (they are the small side by construction), broadcast into a mapInPandas
    GEMM over candidate batches; per-batch partial top-k, then a global
    window finishes. Zero per-row Python."""
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def gemm(batches):
        ids_q, mat_q = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["cv"]), dtype=np.float64)
            c_mat /= np.maximum(
                np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-30
            )
            scores = c_mat @ mat_q.T  # (n_cand, n_query)
            n_c = len(c_ids)
            topn = min(k + 1, n_c)
            # per-query partial top-(k+1) inside the batch
            part = np.argpartition(-scores, topn - 1, axis=0)[:topn]
            out_q, out_c, out_s = [], [], []
            for qi in range(len(ids_q)):
                sel = part[:, qi]
                out_q.extend([ids_q[qi]] * len(sel))
                out_c.extend(c_ids[sel])
                out_s.extend(scores[sel, qi])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    partial = c.mapInPandas(
        gemm, "query_id long, neighbor_id long, score double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def hyperplane_buckets(
    vecs: DataFrame,
    n_planes: int = 12,
    n_tables: int = 1,
    dim: int | None = None,
    seed: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Random-hyperplane LSH: per vector, one bucket per hash table
    (bit i of a table's bucket = sign(v · h_i)). Returns one row per
    (vector, table): (id, table, bucket) — IDS ONLY by default, so the
    n_tables-way explode never duplicates the float vectors through the
    shuffle (vectors are re-joined once after candidate dedup). Hyperplanes
    drawn from a seeded numpy RNG, embedded as literal arrays (JVM-side dot
    products — no Python). Multi-table (n_tables > 1) is the standard
    recall lever: candidates = union of same-bucket sets across tables."""
    if dim is None:
        first = vecs.select(F.size(vec_col)).first()
        dim = int(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    tables = []
    for t in range(n_tables):
        bucket = None
        for i in range(n_planes):
            h = F.array(*[F.lit(float(x)) for x in planes[t, i]])
            bit = F.when(_dot(F.col(vec_col), h) > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            bucket = bit if bucket is None else bucket.bitwiseOR(bit)
        tables.append(
            F.struct(F.lit(t).alias("table"), bucket.cast("long").alias("bucket"))
        )
    cols = [F.col(id_col)] + ([F.col(vec_col)] if keep_vec else [])
    out_cols = [id_col] + ([vec_col] if keep_vec else [])
    return vecs.select(
        *cols, F.explode(F.array(*tables)).alias("tb")
    ).select(*out_cols, "tb.table", "tb.bucket")


def lsh_ann_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 16,
    seed: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in ANY of ``n_tables`` hash tables. One equi-join on
    (table, bucket) instead of a cross join — the scale path; recall is
    tuned by (n_planes ↓, n_tables ↑). Buckets carry ids only; the float
    vectors are joined back exactly once per side AFTER the candidate-pair
    dedup, so a 16-table setup shuffles 1× the vector bytes, not 16×."""
    qb = hyperplane_buckets(queries, n_planes, n_tables, seed=seed,
                            id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    cb = hyperplane_buckets(candidates, n_planes, n_tables, seed=seed,
                            id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "table", "bucket"
    )
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair may collide in several tables — score once
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_neardup_pairs(
    vecs: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, LSH-bucketed (near-dups collide
    with high probability at high thresholds): (id_a, id_b, score).
    Buckets on ids only; pair dedup happens BEFORE the vectors are joined
    back, so the distinct never shuffles float arrays."""
    b = hyperplane_buckets(vecs, n_planes, n_tables, seed=seed,
                           id_col=id_col, vec_col=vec_col)
    a = b.select(F.col(id_col).alias("id_a"), "table", "bucket")
    c = b.select(F.col(id_col).alias("id_b"), "table", "bucket")
    pairs = (
        a.join(c, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb")))
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )

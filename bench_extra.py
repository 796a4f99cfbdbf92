"""Optimization-round measurement harness (guide §1) — NOT the driver bench.

Isolates the expensive bench/gate paths with noop sinks and Spark job
counts so per-change effects are attributable:

- per-phase decomposition of the iterative algorithms (prepare vs
  per-iteration cost, jobs per iteration);
- the ingest pipeline (pages → edges → relabel) stage by stage;
- the LSH/dedup pipelines (signatures vs banding vs verify).

Usage: python bench_extra.py [section ...]   (default: all sections)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same contract as bench.py.
Prints one JSON line per section. bench.py itself is frozen for
measurement; numbers from this file are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class Prof:
    """Wall time + Spark job-count accounting per labelled phase."""

    def __init__(self, spark):
        self.spark = spark
        self.sc = spark.sparkContext
        self.out: dict[str, dict] = {}

    def _job_id(self) -> int:
        try:
            # nextJobId is an AtomicInteger py4j auto-unwraps to int
            return int(self.sc._jsc.sc().dagScheduler().nextJobId())
        except Exception:
            return -1

    def run(self, name, fn):
        self.sc.setJobDescription(name)
        j0, t0 = self._job_id(), time.perf_counter()
        out = fn()
        t1, j1 = time.perf_counter(), self._job_id()
        self.sc.setJobDescription(None)
        self.out[name] = {"sec": round(t1 - t0, 3), "jobs": j1 - j0}
        return out


def section_pagerank(spark, prof):
    import __spark_entry__ as entry_mod
    from graphsetintersection_spark.operators.pagerank import (
        pagerank_df_iterate,
        pagerank_df_prepare,
    )

    e = entry_mod._lgraph(spark, SF_DIR)
    # warm (JIT/codegen) — separate labels so the cold run is visible too
    prep = prof.run("pr_prepare_cold", lambda: pagerank_df_prepare(e))
    prof.run(
        "pr_iterate10_cold",
        lambda: pagerank_df_iterate(prep, max_iter=10, tol=None),
    )
    prep.unpersist()
    prep = prof.run("pr_prepare_warm", lambda: pagerank_df_prepare(e))
    prof.run(
        "pr_iterate10_warm",
        lambda: pagerank_df_iterate(prep, max_iter=10, tol=None),
    )
    prof.run(
        "pr_iterate1_warm",
        lambda: pagerank_df_iterate(prep, max_iter=1, tol=None),
    )
    prep.unpersist()


def section_ppr_hits(spark, prof):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    prof.run("ppr_query_cold", lambda: q["personalized_pagerank"](spark, SF_DIR).collect())
    prof.run("ppr_query_warm", lambda: q["personalized_pagerank"](spark, SF_DIR).collect())
    prof.run("hits_query_cold", lambda: q["hits"](spark, SF_DIR).collect())
    prof.run("hits_query_warm", lambda: q["hits"](spark, SF_DIR).collect())


def section_lgraph(spark, prof):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    prof.run("lgraph_edges_noop", lambda: noop(entry_mod._lgraph(spark, SF_DIR)))
    prof.run("lgraph_pagerank_cold", lambda: q["pagerank"](spark, SF_DIR).collect())
    prof.run("lgraph_pagerank_warm", lambda: q["pagerank"](spark, SF_DIR).collect())
    prof.run("lgraph_tc_warm", lambda: q["triangle_count"](spark, SF_DIR).collect())


def section_ingest(spark, prof):
    from graphsetintersection_spark.operators.edges import degrees
    from graphsetintersection_spark.operators.relabel import (
        apply_order,
        bfs_order,
        degree_order,
    )
    from graphsetintersection_spark.session import read_table
    from graphsetintersection_spark.sources.extract import link_edges
    from graphsetintersection_spark.sources.pages import generate_pages

    li_rows = read_table(spark, SF_DIR, "lineitem").count()
    n_pages = max(2000, li_rows // 30)
    pages = generate_pages(spark, n_pages, avg_links=12.0, seed=42)
    prof.run("ingest_pages_noop", lambda: noop(pages))
    edges = prof.run("ingest_link_edges", lambda: link_edges(pages).persist())
    prof.run("ingest_edges_count", edges.count)
    deg = degrees(edges).persist()
    prof.run("ingest_degrees_count", deg.count)
    order = prof.run("ingest_degree_order", lambda: degree_order(edges, deg=deg))
    rel = apply_order(edges, order).persist()
    prof.run("ingest_apply_order_count", rel.count)
    prof.run("ingest_bfs_order", lambda: bfs_order(edges))
    for f in (edges, deg, rel):
        f.unpersist()


def section_cc(spark, prof):
    import __spark_entry__ as entry_mod
    from graphsetintersection_spark.operators.components import (
        connected_components_minlabel,
        connected_components_starcontraction,
    )

    g = entry_mod._sgraph(spark, SF_DIR)
    prof.run(
        "cc_star_cold",
        lambda: connected_components_starcontraction(g, max_rounds=30).components.count(),
    )
    prof.run(
        "cc_star_warm",
        lambda: connected_components_starcontraction(g, max_rounds=30).components.count(),
    )
    prof.run(
        "cc_minlabel_warm",
        lambda: connected_components_minlabel(g, max_rounds=50).components.count(),
    )


def section_dedup(spark, prof):
    from pyspark.sql import functions as F

    from graphsetintersection_spark.functions.dedup import (
        jaccard_for_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from graphsetintersection_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    prof.run(
        "dedup_sigs128_noop",
        lambda: noop(minhash_signatures(docs, num_perm=128)),
    )
    prof.run(
        "dedup_lsh_prod_cold",
        lambda: minhash_lsh_pairs(
            docs, num_perm=128, bands=32, threshold=0.5,
            verify=True, verify_hashed=True, est_prefilter_sigmas=4.0,
        ).collect(),
    )
    prof.run(
        "dedup_lsh_prod_warm",
        lambda: minhash_lsh_pairs(
            docs, num_perm=128, bands=32, threshold=0.5,
            verify=True, verify_hashed=True, est_prefilter_sigmas=4.0,
        ).collect(),
    )
    cand = prof.run(
        "dedup_lsh_cand_only",
        lambda: minhash_lsh_pairs(
            docs, num_perm=128, bands=32, verify=False
        ).persist(),
    )
    prof.run("dedup_cand_count", cand.count)
    prof.run(
        "dedup_verify_pairs",
        lambda: jaccard_for_pairs(docs, cand, hashed=True, mode="pairs").collect(),
    )
    cand.unpersist()


def section_coldkeys(spark, prof):
    """Cold-run decomposition of the two REPEAT_BUDGET-bimodal bench keys
    (stream_neardup_prod, pagerank_kernel_iters): when their FIRST
    execution exceeds bench.py's 3.0 s repeat budget they stay
    cold-single-shot and the headline records the codegen-laden run."""
    from pyspark.sql import functions as F

    from graphsetintersection_spark.session import read_table
    from graphsetintersection_spark.streaming.dedup import (
        _validate_index,
        minhash_band_index,
        stream_minhash_neardup,
    )

    docs_full = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    half = docs_full.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    idx = minhash_band_index(
        docs_full.where(F.col("doc_id") <= half), num_perm=128, bands=32
    ).persist()
    # the bench key's cold run, split: validate-aggregate (materializes the
    # index persist: signature kernel over half the corpus + banding) vs
    # the stream-side signatures + (band,bucket) join + dedup + collect
    prof.run("snp_validate_cold", lambda: _validate_index(idx, 128, 32))
    matches = stream_minhash_neardup(
        docs_full.where(F.col("doc_id") > half), idx,
        num_perm=128, bands=32, threshold=0.5, validate=False,
    )
    prof.run("snp_join_collect_cold", lambda: matches.collect())
    prof.run("snp_validate_warm", lambda: _validate_index(idx, 128, 32))
    prof.run("snp_join_collect_warm", lambda: matches.collect())
    idx.unpersist()

    # pagerank_kernel over the bench's ingest graph, cold then warm
    from graphsetintersection_spark.operators.edges import degrees
    from graphsetintersection_spark.operators.pagerank import (
        pagerank_kernel_iterate,
        pagerank_kernel_prepare,
    )
    from graphsetintersection_spark.operators.relabel import (
        apply_order,
        degree_order,
    )
    from graphsetintersection_spark.sources.extract import link_edges
    from graphsetintersection_spark.sources.pages import generate_pages

    li_rows = read_table(spark, SF_DIR, "lineitem").count()
    pages = generate_pages(spark, max(2000, li_rows // 30), avg_links=12.0, seed=42)
    edges = link_edges(pages).persist()
    rel = apply_order(edges, degree_order(edges, deg=degrees(edges))).persist()
    rel.count()
    prep = prof.run(
        "prk_prepare_cold", lambda: pagerank_kernel_prepare(rel, relabel=False)
    )
    prof.run(
        "prk_iter3_cold", lambda: pagerank_kernel_iterate(prep, max_iter=3)
    )
    prof.run(
        "prk_iter3_warm", lambda: pagerank_kernel_iterate(prep, max_iter=3)
    )
    prof.run(
        "prk_iter1_warm", lambda: pagerank_kernel_iterate(prep, max_iter=1)
    )
    prep.unpersist()
    edges.unpersist()
    rel.unpersist()


SECTIONS = {
    "pagerank": section_pagerank,
    "ppr_hits": section_ppr_hits,
    "lgraph": section_lgraph,
    "ingest": section_ingest,
    "cc": section_cc,
    "dedup": section_dedup,
    "coldkeys": section_coldkeys,
}


def main() -> None:
    from graphsetintersection_spark.session import get_spark

    wanted = sys.argv[1:] or list(SECTIONS)
    spark = get_spark(app_name="gsi-bench-extra", master=f"local[{CPUS}]")
    for name in wanted:
        prof = Prof(spark)
        SECTIONS[name](spark, prof)
        print(json.dumps({"section": name, "phases": prof.out}))
    spark.stop()


if __name__ == "__main__":
    main()

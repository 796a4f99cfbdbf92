"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Graph queries run over two SQL-exact derived graphs (pure integer
arithmetic from ``lineitem`` — identical in Spark and DuckDB, see
``graphsetintersection_spark.sources.graphio``):

- ``lgraph``  (dense, V=2000)  — triangle count, degrees, relabel, PageRank
- ``sgraph``  (sparse, V=5000) — connected components, label propagation
  (sparse so the DuckDB recursive-CTE reachability oracle stays tractable)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphsetintersection_spark.session import read_table
from graphsetintersection_spark.sources.graphio import LGRAPH_V, lineitem_graph_sql

SF_TINY = "/root/testdata/sf0.001"

SGRAPH_V = 5000
PR_ITERS = 10
PR_ALPHA = 0.85
LPA_ROUNDS = 4

# --------------------------------------------------------------------------
# derived-graph SQL (shared verbatim by Spark and DuckDB)
# --------------------------------------------------------------------------

_LGRAPH_EDGES = f"""
select distinct src, dst from ({lineitem_graph_sql(LGRAPH_V)})
where src <> dst
"""

_SGRAPH_EDGES = f"""
select distinct src, dst from (
  {lineitem_graph_sql(SGRAPH_V)}
) where src <> dst and (src + dst) % 11 < 2
"""


def _spark_edges(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(sql)


def _lgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_edges(spark, sf_dir, _LGRAPH_EDGES)


def _sgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_edges(spark, sf_dir, _SGRAPH_EDGES)


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------

def _q_lgraph_edges(spark, sf_dir):
    return _lgraph(spark, sf_dir)


def _q_degree_table(spark, sf_dir):
    from graphsetintersection_spark.operators.edges import degrees

    return degrees(_lgraph(spark, sf_dir)).select("v", "out_deg", "in_deg", "deg")


def _q_degree_relabel(spark, sf_dir):
    from graphsetintersection_spark.operators.relabel import degree_order

    return degree_order(_lgraph(spark, sf_dir)).select("org_id", "new_id")


def _q_comp_ratio(spark, sf_dir):
    from graphsetintersection_spark.operators.relabel import comp_ratio

    r = comp_ratio(_lgraph(spark, sf_dir))
    return spark.createDataFrame(
        [(float(round(r, 9)),)], "comp_ratio double"
    )


def _q_hubs(spark, sf_dir):
    from graphsetintersection_spark.operators.relabel import select_bignode

    return select_bignode(_lgraph(spark, sf_dir), deg_ratio=0.3).select(
        "v", "deg", "cum_deg"
    )


def _q_triangle_count(spark, sf_dir):
    from graphsetintersection_spark.operators.triangle import triangle_count_kernel

    n = triangle_count_kernel(_lgraph(spark, sf_dir))
    return spark.createDataFrame([(n,)], "triangles long")


def _q_triangles_per_edge(spark, sf_dir):
    from graphsetintersection_spark.operators.triangle import triangles_per_edge

    return triangles_per_edge(_lgraph(spark, sf_dir)).select("src", "dst", "common")


def _q_pagerank(spark, sf_dir):
    from graphsetintersection_spark.operators.pagerank import pagerank

    res = pagerank(_lgraph(spark, sf_dir), alpha=PR_ALPHA, max_iter=PR_ITERS, tol=None)
    return res.ranks.select(
        "v", F.round(F.col("rank") * 1e6, 0).cast("long").alias("rank_ppm")
    )


def _q_connected_components(spark, sf_dir):
    from graphsetintersection_spark.operators.components import (
        connected_components_starcontraction,
    )

    res = connected_components_starcontraction(_sgraph(spark, sf_dir), max_rounds=30)
    return res.components.select("v", "component")


def _q_label_propagation(spark, sf_dir):
    from graphsetintersection_spark.operators.labelprop import label_propagation

    res = label_propagation(
        _sgraph(spark, sf_dir), max_rounds=LPA_ROUNDS, fixed_rounds=True
    )
    return res.labels.select("v", "label")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lgraph_edges": _q_lgraph_edges,
        "degree_table": _q_degree_table,
        "degree_relabel": _q_degree_relabel,
        "comp_ratio": _q_comp_ratio,
        "hubs": _q_hubs,
        "triangle_count": _q_triangle_count,
        "triangles_per_edge": _q_triangles_per_edge,
        "pagerank": _q_pagerank,
        "connected_components": _q_connected_components,
        "label_propagation": _q_label_propagation,
    }


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

_ORIENTED = """
oriented as (
  select distinct least(src, dst) as a, greatest(src, dst) as b from edges
)
"""


def _pagerank_oracle_sql() -> str:
    """Textbook power iteration, PR_ITERS unrolled iterations, identical
    semantics to operators.pagerank (damping + dangling redistribution)."""
    a = PR_ALPHA
    parts = [
        f"with edges as materialized ({_LGRAPH_EDGES})",
        "verts as materialized (select src as v from edges union select dst from edges)",
        "nn as materialized (select count(*) as c from verts)",
        "outdeg as materialized (select src as v, count(*) as od from edges group by src)",
        "r0 as materialized (select v, 1.0/(select c from nn) as rank from verts)",
    ]
    for i in range(PR_ITERS):
        p, q = f"r{i}", f"r{i + 1}"
        parts.append(
            f"d{i} as materialized (select coalesce(sum(rank),0) as dm from {p} "
            f"where v not in (select v from outdeg))"
        )
        parts.append(
            f"c{i} as materialized (select e.dst as v, sum(r.rank/o.od) as contrib "
            f"from edges e join {p} r on r.v = e.src "
            f"join outdeg o on o.v = e.src group by e.dst)"
        )
        parts.append(
            f"{q} as materialized (select verts.v, (1-{a})/(select c from nn) + {a}*("
            f"coalesce(c{i}.contrib, 0) + (select dm from d{i})/(select c from nn)"
            f") as rank from verts left join c{i} on c{i}.v = verts.v)"
        )
    parts.append(
        f"select v, cast(round(rank * 1000000, 0) as bigint) as rank_ppm "
        f"from r{PR_ITERS}"
    )
    return ",\n".join(parts[:1] + parts[1:-1]) + "\n" + parts[-1]


def _lpa_oracle_sql() -> str:
    """Synchronous LPA, LPA_ROUNDS unrolled, tie-break (count desc, label
    asc), isolated vertices keep their label."""
    parts = [
        f"with edges as materialized ({_SGRAPH_EDGES})",
        "und as materialized (select src as u, dst as w from edges "
        "union select dst, src from edges)",
        "verts as materialized (select u as v from und union select w from und)",
        "l0 as materialized (select v, v as label from verts)",
    ]
    for i in range(LPA_ROUNDS):
        p, q = f"l{i}", f"l{i + 1}"
        parts.append(
            f"cnt{i} as materialized (select und.w as v, {p}.label, count(*) as cnt "
            f"from und join {p} on {p}.v = und.u group by und.w, {p}.label)"
        )
        parts.append(
            f"best{i} as materialized (select v, label from (select v, label, row_number() "
            f"over (partition by v order by cnt desc, label asc) as rn "
            f"from cnt{i}) t where rn = 1)"
        )
        parts.append(
            f"{q} as materialized (select verts.v, coalesce(best{i}.label, {p}.label) as label "
            f"from verts left join best{i} on best{i}.v = verts.v "
            f"join {p} on {p}.v = verts.v)"
        )
    parts.append(f"select v, label from l{LPA_ROUNDS}")
    return ",\n".join(parts[:1] + parts[1:-1]) + "\n" + parts[-1]


def oracle_sql() -> dict[str, str]:
    return {
        "lgraph_edges": f"with edges as ({_LGRAPH_EDGES}) select src, dst from edges",
        "degree_table": f"""
with edges as ({_LGRAPH_EDGES}),
o as (select src as v, count(*) as out_deg from edges group by src),
i as (select dst as v, count(*) as in_deg from edges group by dst)
select coalesce(o.v, i.v) as v,
       coalesce(out_deg, 0) as out_deg,
       coalesce(in_deg, 0) as in_deg,
       coalesce(out_deg, 0) + coalesce(in_deg, 0) as deg
from o full outer join i on o.v = i.v
""",
        "degree_relabel": f"""
with edges as ({_LGRAPH_EDGES}),
o as (select src as v, count(*) as out_deg from edges group by src),
i as (select dst as v, count(*) as in_deg from edges group by dst),
deg as (
  select coalesce(o.v, i.v) as v,
         coalesce(out_deg, 0) + coalesce(in_deg, 0) as deg
  from o full outer join i on o.v = i.v
)
select v as org_id,
       cast(row_number() over (order by deg desc, v asc) - 1 as bigint) as new_id
from deg
""",
        "comp_ratio": f"""
with edges as ({_LGRAPH_EDGES}),
blk as (
  select src, count(distinct dst // 64) as n_blocks, count(*) as n_edges
  from edges group by src
)
select round(cast(sum(n_blocks) as double) / sum(n_edges), 9) as comp_ratio
from blk
""",
        "hubs": f"""
with edges as ({_LGRAPH_EDGES}),
o as (select src as v, count(*) as out_deg from edges group by src),
i as (select dst as v, count(*) as in_deg from edges group by dst),
deg as (
  select coalesce(o.v, i.v) as v,
         coalesce(out_deg, 0) + coalesce(in_deg, 0) as deg
  from o full outer join i on o.v = i.v
),
ranked as (
  select v, deg,
         sum(deg) over (order by deg desc, v asc
                        rows between unbounded preceding and current row)
           as cum_deg
  from deg
)
select v, deg, cum_deg from ranked
where cum_deg - deg < 0.3 * (select sum(deg) from deg)
""",
        "triangle_count": f"""
with edges as ({_LGRAPH_EDGES}),
{_ORIENTED}
select count(*) as triangles
from oriented e1
join oriented e2 on e2.a = e1.b
join oriented e3 on e3.a = e1.a and e3.b = e2.b
""",
        "triangles_per_edge": f"""
with edges as ({_LGRAPH_EDGES}),
{_ORIENTED}
select bc.a as src, bc.b as dst, count(*) as common
from oriented bc
join oriented ab on ab.b = bc.a
join oriented ac on ac.a = ab.a and ac.b = bc.b
group by bc.a, bc.b
""",
        "pagerank": _pagerank_oracle_sql(),
        "connected_components": f"""
with recursive edges as ({_SGRAPH_EDGES}),
und as (select src as u, dst as w from edges union select dst, src from edges),
reach(v, m) as (
  select u, u from und
  union
  select und.w, reach.m from reach join und on und.u = reach.v
)
select v, min(m) as component from reach group by v
""",
        "label_propagation": _lpa_oracle_sql(),
    }


# --------------------------------------------------------------------------
# flagship entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triangle count (Arrow-kernel form) + PageRank top ranks of
    the dense derived graph at sf0.001."""
    return _q_pagerank(spark, SF_TINY).orderBy(F.col("rank_ppm").desc(), "v").limit(100)

"""graphsetintersection_spark — a PySpark-native link-graph analytics engine.

A from-scratch rebuild of the *capabilities* of pkumod/GraphSetIntersection
(Han, Zou, Yu, "Speeding Up Set Intersections in Graph Algorithms using
SIMD Instructions", SIGMOD 2018) on Apache Spark:

- sorted-adjacency set-intersection kernels, re-expressed as vectorized
  numpy/Arrow kernels inside pandas UDFs (``kernels``)
- triangle counting, maximal cliques, subgraph matching (``operators``)
- PageRank, connected components, label propagation — iterative DataFrame
  jobs with checkpoint/resume (``operators``, ``plans.checkpoint``)
- degree-ordering vertex relabel + BSR density metrics — the reference's
  graph-reordering trick as a relational job (``operators.relabel``)
- a Common-Crawl-style web-page corpus source with deterministic HTML→text
  extraction and link extraction (``sources``)
- web-scale training-data pipeline ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), ANN similarity search, text quality /
  language-ID / fingerprinting (``functions``)

Everything is DataFrame-first: Catalyst plans the joins, Tungsten runs the
relational part, and the only Python on the hot path is Arrow-batched numpy.
"""

__version__ = "0.1.0"

from graphsetintersection_spark.session import get_spark  # noqa: F401

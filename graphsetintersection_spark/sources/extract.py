"""Deterministic HTML → text and HTML → links extraction.

North-rule contract: the extractor is a PURE FUNCTION of the ``html``
bytes — byte-identical ``text`` per ``url`` on every run, every
partitioning, every cluster size. Both extractors are pure Spark column
expressions (JVM regex, whole-stage codegen — not even a pandas UDF), so
determinism is structural: no library version drift, no charset guessing.

Extraction rules (fixed, versioned by EXTRACTOR_VERSION):
1. decode UTF-8
2. drop <script>…</script> and <style>…</style> blocks
3. strip all tags
4. collapse runs of whitespace to single spaces, trim

``extract_links`` pulls every ``<a href="...">`` target — the edge source
for the link graph (the reference's load_graph equivalent for web data:
pages are the raw input, the edge list is derived, src/util.cpp:37-61
parses its text-file analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EXTRACTOR_VERSION = 1

_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"\s+"
_HREF_RE = r'(?i)<a\s[^>]*href="([^"]*)"'


def extract_text_col(html: Column) -> Column:
    """html binary → extracted text (pure column expression)."""
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _SCRIPT_RE, " ")
    s = F.regexp_replace(s, _STYLE_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    s = F.regexp_replace(s, _WS_RE, " ")
    return F.trim(s)


def extract_text(pages: DataFrame) -> DataFrame:
    """pages → (url, text) using the engine extractor."""
    return pages.select("url", extract_text_col(F.col("html")).alias("text"))


def extract_links(pages: DataFrame) -> DataFrame:
    """pages → (src_url, dst_url) — one row per <a href> anchor.

    JVM-side regexp_extract_all + explode; filters are pushed into the
    parquet scan (only url + html columns are read)."""
    hrefs = F.regexp_extract_all(
        F.decode(F.col("html"), "UTF-8"), F.lit(_HREF_RE), F.lit(1)
    )
    return (
        pages.select(F.col("url").alias("src_url"), hrefs.alias("hrefs"))
        .select("src_url", F.explode("hrefs").alias("dst_url"))
        .where(F.col("dst_url") != "")
    )


def link_edges(pages: DataFrame) -> DataFrame:
    """pages → integer edge table (src, dst) via the url dictionary.

    The vertex dictionary assigns continuous 0-based ids ordered by url
    (deterministic; reference requires continuous ids, README.md:44 /
    python/trans_graph.py). Id assignment is the two-phase distributed
    range-shuffle rank (plans.assign), not a single-reducer global window.
    Degree-desc relabel (operators.relabel) is then applied downstream as
    the densification step."""
    from graphsetintersection_spark.plans.assign import global_order_stats

    # materialize the anchor extraction ONCE (eager localCheckpoint,
    # blocks GC-released with the frame): the url-dictionary build and the
    # dictionary join both consume it, and Spark does not dedupe common
    # subtrees — unchecked, the html regex pass (the ingest cost center at
    # corpus scale) ran once per reference (guide §2.4/§5)
    links = extract_links(pages).localCheckpoint(eager=True)
    urls = (
        pages.select(F.col("url"))
        .union(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    vdict = global_order_stats(
        urls, [F.col("url").asc()], rank_col="vid"
    ).select("url", "vid")
    return (
        links.join(vdict.withColumnRenamed("url", "src_url"), "src_url")
        .withColumnRenamed("vid", "src")
        .join(
            vdict.withColumnRenamed("url", "dst_url").withColumnRenamed("vid", "dst"),
            "dst_url",
        )
        .select("src", "dst")
    )

"""Deterministic synthetic Common-Crawl-style web-page corpus.

The north rule's input shape (BASELINE.json ``input_hint``): an Iceberg
table of pages ``(url: string, warc_ts: timestamp, html: binary,
text: string, lang: string)``. This module synthesizes that table at any
scale with zero external data and zero driver-side loops — the generator is
a pure Spark plan over ``spark.range`` using only JVM built-ins
(xxhash64-seeded pseudo-randomness), so it distributes and is reproducible
bit-for-bit at any parallelism.

Link structure: each page emits ``n_links(page)`` anchors whose targets
follow a Zipf-like popularity distribution (``target ∝ u^gamma`` over a
xxhash64 uniform), producing the heavy-tailed in-degree hubs that the
engine's skew handling (hub broadcast, salted aggregation, AQE) exists for.

The stored ``text`` column is definitionally the output of the engine's own
deterministic extractor applied to ``html`` — making the north rule's
per-row invariant ("byte-identical extracted text per url") a testable pure
-function property (see sources.extract and tests/test_pages_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = [("en", 60), ("de", 75), ("fr", 85), ("es", 95), ("zh", 100)]

_WORDS = [
    "crawl", "graph", "vertex", "edge", "spark", "arrow", "kernel",
    "intersect", "rank", "cluster", "shard", "index", "query", "batch",
]


PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages table from its production or sandbox form.

    ``source`` is an Iceberg/catalog TABLE NAME (the north rule's input —
    read via ``spark.read.table``, so Iceberg partition pruning and
    snapshot isolation apply) unless it looks like a filesystem path, in
    which case it is read as parquet (the sandbox stand-in). Only the five
    contract columns are selected either way, so the scan prunes to them.
    """
    looks_like_path = source.startswith(("/", "file:", "s3:", "hdfs:", ".")) or (
        source.endswith(".parquet")
    )
    df = (
        spark.read.parquet(source)
        if looks_like_path
        else spark.read.table(source)
    )
    return df.select(*PAGES_COLUMNS)


def _uniform(seed_col: Column, lo: float = 0.0, hi: float = 1.0) -> Column:
    """Deterministic pseudo-uniform in [lo, hi) from a column via xxhash64."""
    u = (F.xxhash64(seed_col) % F.lit(1_000_003) + F.lit(1_000_003)) % F.lit(
        1_000_003
    ) / F.lit(1_000_003.0)
    return F.lit(lo) + u * F.lit(hi - lo)


def page_url(page_id: Column, n_sites: int) -> Column:
    site = F.pmod(F.xxhash64(page_id, F.lit("site")), F.lit(n_sites))
    return F.concat(
        F.lit("https://site"), site, F.lit(".example/p/"), page_id
    )


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    avg_links: float = 12.0,
    gamma: float = 3.0,
    n_sites: int = 97,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize the pages table. ``gamma`` controls hub skew: link target
    = floor(V * u^gamma) for u ~ U[0,1), so small ids are heavy hubs.

    Returns DataFrame[url string, warc_ts timestamp, html binary,
    text string, lang string] — the exact input_hint schema.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_pages, 1, partitions).withColumnRenamed("id", "page_id")
    base = base.withColumn("_seed", F.lit(seed))

    # number of outlinks per page: 1 + uniform * 2 * (avg-1)  (mean = avg)
    n_links = (
        F.lit(1)
        + F.floor(
            _uniform(F.concat(F.col("page_id"), F.lit(":n:"), F.col("_seed")))
            * F.lit(2.0 * (avg_links - 1.0))
        )
    ).cast("int")

    # one array column of link ids: Zipf-ish via u^gamma (JVM-side transform)
    link_ids = F.transform(
        F.sequence(F.lit(1), n_links),
        lambda k: F.floor(
            F.pow(
                _uniform(F.concat(F.col("page_id"), F.lit(":l:"), k, F.lit(":"),
                                  F.col("_seed"))),
                F.lit(gamma),
            )
            * F.lit(float(n_pages))
        ).cast("long"),
    )

    df = base.withColumn("link_ids", link_ids)

    anchors = F.array_join(
        F.transform(
            F.col("link_ids"),
            lambda t: F.concat(
                F.lit('<p>Read <a href="'),
                page_url(t, n_sites),
                F.lit('">'),
                F.lit("ref-"), t,
                F.lit("</a> now.</p>"),
            ),
        ),
        "\n",
    )

    lang = (
        F.when(_uniform(F.concat(F.col("page_id"), F.lit(":lang"))) * 100 < LANGS[0][1], LANGS[0][0])
    )
    for code, cum in LANGS[1:]:
        lang = lang.when(
            _uniform(F.concat(F.col("page_id"), F.lit(":lang"))) * 100 < cum, code
        )
    lang = lang.otherwise("en")

    body_words = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda k: F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                F.pmod(
                    F.xxhash64(F.col("page_id"), k, F.lit("w")), F.lit(len(_WORDS))
                ).cast("int")
                + 1,
            ),
        ),
        " ",
    )

    html_str = F.concat(
        F.lit("<html><head><title>Page "), F.col("page_id"),
        F.lit("</title><script>var x=1;</script>"
              "<style>.a{color:red}</style></head><body><h1>Page "),
        F.col("page_id"), F.lit("</h1><p>"), body_words, F.lit("</p>"),
        anchors,
        F.lit("</body></html>"),
    )

    out = df.select(
        page_url(F.col("page_id"), n_sites).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.col("page_id").cast("int"))
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        lang.alias("lang"),
        F.col("page_id"),
    )
    # stored text := extractor(html) — the per-row invariant by construction
    from graphsetintersection_spark.sources.extract import extract_text_col

    return out.select(
        "url", "warc_ts", "html", extract_text_col(F.col("html")).alias("text"),
        "lang",
    )

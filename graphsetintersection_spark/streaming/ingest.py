"""Structured-Streaming ingest for a continuously crawled pages corpus.

The reference is batch-only (SURVEY.md §2.6 — no streaming surface); these
operators extend the engine to the incremental-crawl setting a web-scale
deployment needs:

- ``stream_pages``        — readStream over a pages directory (new parquet
  files = newly crawled WARC batches).
- ``stream_link_edges``   — incremental link extraction: the SAME pure
  column expressions as the batch extractor (sources.extract), so batch
  and stream agree row-for-row; appends (src_url, dst_url, warc_ts) to an
  edge sink exactly-once via the streaming checkpoint.
- ``stream_link_rates``   — watermarked sliding-window counts of extracted
  links per language (late data handled by the watermark).

Incremental graph maintenance = append-only edge log + periodic compaction
(orient/distinct) — the batch operators then run on any snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphsetintersection_spark.sources.extract import _HREF_RE

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(pages_dir)
    )


def stream_link_edges(pages_stream: DataFrame) -> DataFrame:
    """Incremental (src_url, dst_url, warc_ts, lang) link stream — identical
    extraction semantics to the batch path."""
    hrefs = F.regexp_extract_all(
        F.decode(F.col("html"), "UTF-8"), F.lit(_HREF_RE), F.lit(1)
    )
    return (
        pages_stream.select(
            F.col("url").alias("src_url"), "warc_ts", "lang", hrefs.alias("hrefs")
        )
        .select("src_url", "warc_ts", "lang", F.explode("hrefs").alias("dst_url"))
        .where(F.col("dst_url") != "")
    )


def start_edge_sink(
    edges_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Exactly-once append of the edge log (resume = restart with the same
    checkpoint dir — Structured Streaming replays nothing twice)."""
    return (
        edges_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
_SESSION_STATE_SCHEMA = "ts array<long>"


def stream_sessionize(
    events_stream: DataFrame,
    gap_min: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming sessionization — the custom stateful operator
    path (``applyInPandasWithState``): per user, events within
    ``gap_min`` minutes of each other share a session. A session is
    emitted only once the EVENT-TIME WATERMARK passes its end + gap — the
    point after which Spark guarantees no in-watermark event can still
    join or split it — so the emitted sessions are EXACTLY the batch
    sessionizer's output over all non-late events, in any arrival order.

    State per user = the event timestamps of sessions not yet
    watermark-closed (bounded by the watermark horizon × per-user event
    rate); each batch merges new events into the buffer, re-derives
    sessions from the sorted set, emits the watermark-closed prefix and
    keeps the rest. (The r2 version closed a session eagerly when a
    past-gap event arrived and kept only (start, last, n) — an
    out-of-order event inside the watermark could then move the open
    session's end BACKWARDS or be wrongly split; re-deriving from the
    buffered set removes that divergence. ADVICE r2 #1.)

    Epoch seconds in the output keep the comparison engine-neutral."""
    import pandas as pd  # noqa: F401  (worker-side import)

    gap = gap_min * 60

    def fn(key, pdfs, state):
        import pandas as pd

        user_id = key[0]
        new_ts: list[int] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                es = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
                new_ts.extend(int(x) for x in es)
        buf = list(state.get[0]) if state.exists else []
        merged = sorted(buf + new_ts)
        if not merged:
            if state.exists:
                state.remove()
            return

        # derive sessions from the full (sorted) buffered event set
        sessions: list[tuple[int, int, int]] = []
        s = last = merged[0]
        n = 1
        for e in merged[1:]:
            if e - last > gap:
                sessions.append((s, last, n))
                s, last, n = e, e, 1
            else:
                last = e
                n += 1
        sessions.append((s, last, n))

        wm = state.getCurrentWatermarkMs() // 1000
        # STRICT close: an event at exactly ts = end + gap would still merge
        # (gap is inclusive), and Spark admits events with ts == watermark
        closed = [c for c in sessions if c[1] + gap < wm]
        still_open = sessions[len(closed):]
        if still_open:
            cutoff = still_open[0][0]
            state.update(([t for t in merged if t >= cutoff],))
            # wake up just past the earliest open session's close point
            # (+1 ms keeps the timestamp strictly above the watermark even
            # when end + gap == wm)
            state.setTimeoutTimestamp((still_open[0][1] + gap) * 1000 + 1)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def stream_link_rates(
    edges_stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked sliding-window link counts per language."""
    return (
        edges_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window, slide), "lang")
        .agg(F.count("*").alias("n_links"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "lang",
            "n_links",
        )
    )

"""Streaming ingest: batch/stream extraction parity, exactly-once resume,
and watermarked windowed aggregation."""

import os

from pyspark.sql import functions as F

from graphsetintersection_spark.sources.extract import extract_links
from graphsetintersection_spark.sources.pages import generate_pages
from graphsetintersection_spark.streaming.ingest import (
    start_edge_sink,
    stream_link_edges,
    stream_link_rates,
    stream_pages,
)


def _write_pages(spark, path, n=120, seed=5, files=6):
    generate_pages(spark, n, avg_links=5.0, seed=seed).repartition(files).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_matches_batch_extraction(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "edges")
    ck_dir = str(tmp_path / "ck")
    _write_pages(spark, pages_dir)

    stream = stream_link_edges(stream_pages(spark, pages_dir))
    q = start_edge_sink(stream, out_dir, ck_dir)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .select("src_url", "dst_url")
        .orderBy("src_url", "dst_url")
        .collect()
    )
    batch = (
        extract_links(spark.read.parquet(pages_dir))
        .orderBy("src_url", "dst_url")
        .collect()
    )
    assert [(r["src_url"], r["dst_url"]) for r in got] == [
        (r["src_url"], r["dst_url"]) for r in batch
    ]


def test_stream_resume_is_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages2")
    out_dir = str(tmp_path / "edges2")
    ck_dir = str(tmp_path / "ck2")
    _write_pages(spark, pages_dir)

    stream = stream_link_edges(stream_pages(spark, pages_dir))
    q = start_edge_sink(stream, out_dir, ck_dir)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()

    # restart with the same checkpoint: no new files → no duplicates
    q2 = start_edge_sink(stream, out_dir, ck_dir)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1

    # add a new batch of pages → only the delta is appended
    extra_dir = str(tmp_path / "pages2" )
    generate_pages(spark, 30, avg_links=5.0, seed=99).write.mode("append").parquet(
        extra_dir
    )
    q3 = start_edge_sink(stream, out_dir, ck_dir)
    q3.awaitTermination(120)
    n3 = spark.read.parquet(out_dir).count()
    delta = extract_links(generate_pages(spark, 30, avg_links=5.0, seed=99)).count()
    assert n3 == n1 + delta


def test_windowed_link_rates(spark, tmp_path):
    pages_dir = str(tmp_path / "pages3")
    _write_pages(spark, pages_dir, n=200)
    rates = stream_link_rates(stream_link_edges(stream_pages(spark, pages_dir)))
    q = (
        rates.writeStream.outputMode("append")
        .format("memory")
        .queryName("rates_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; check the query ran and the
    # aggregation is well-formed via the complete-mode equivalent
    q2 = (
        rates.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates_all")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("select * from rates_all").collect()
    assert len(rows) > 0
    total = sum(r["n_links"] for r in rows)
    batch_total = extract_links(spark.read.parquet(pages_dir)).count()
    # sliding windows double-count by design (window/slide = 2)
    assert total == 2 * batch_total


def test_stateful_stream_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted,
    open session held in state; closed output matches the batch
    sessionizer's closed prefix."""
    import datetime as dt

    from graphsetintersection_spark.streaming.ingest import stream_sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    # watermark after the batch = t(62) - 10min = t(52)
    # user 1: session A (0,5,10) closed by the later event at t(60);
    #         session B (60,62) has timeout t(92) > watermark → stays open
    # user 2: session (0,1) has timeout t(31) < watermark → closed by
    #         EVENT-TIME TIMEOUT in the follow-up micro-batch and emitted
    rows = [
        (1, t(0)), (1, t(5)), (1, t(10)), (1, t(60)), (1, t(62)),
        (2, t(0)), (2, t(1)),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(
        events_dir
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(events_dir)
    )
    sessions = stream_sessionize(stream, gap_min=30, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess").collect()
    )
    epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == [
        (1, epoch, epoch + 600, 3),      # closed by gap
        (2, epoch, epoch + 60, 2),       # closed by event-time timeout
    ]


def test_sessionize_out_of_order_across_batches(spark, tmp_path):
    """An in-watermark LATE event arriving in a later micro-batch must
    merge into (and extend) the session exactly as the batch sessionizer
    would — the r2 implementation moved the open session's end backwards
    instead (ADVICE r2 #1). Two availableNow runs over the same streaming
    checkpoint emulate the two micro-batches."""
    import datetime as dt

    from graphsetintersection_spark.streaming.ingest import stream_sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    events_dir = str(tmp_path / "ooo_events")
    out_dir = str(tmp_path / "ooo_out")
    ck_dir = str(tmp_path / "ooo_ck")

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(events_dir)
        )
        q = (
            stream_sessionize(stream, gap_min=30, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: t0, t20 (one session so far), t100 (later; advances the
    # watermark to t40 after the batch)
    spark.createDataFrame(
        [(1, t(0)), (1, t(20)), (1, t(100))], "user_id long, ts timestamp"
    ).write.mode("append").parquet(events_dir)
    run_once()

    # batch 2: LATE event t45 (>= watermark t40) — bridges t20→t45 with
    # gaps ≤ 30min, so the batch semantics give ONE session (t0..t45).
    # A fresh user-2 event at t200 advances the watermark to t140, which
    # closes both of user 1's sessions via event-time timeout.
    spark.createDataFrame(
        [(1, t(45)), (2, t(200))], "user_id long, ts timestamp"
    ).write.mode("append").parquet(events_dir)
    run_once()

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    )
    epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == [
        (1, epoch, epoch + 45 * 60, 3),          # late t45 merged, end FORWARD
        (1, epoch + 100 * 60, epoch + 100 * 60, 1),
    ]


# ---- pure-step unit tests (no Spark): state compaction + batch parity


def _batch_sessions(events, gap):
    """Batch oracle: sort, chain with gap, emit (start, end, n)."""
    ev = sorted(events)
    if not ev:
        return []
    out = []
    s = last = ev[0]
    n = 1
    for e in ev[1:]:
        if e - last > gap:
            out.append((s, last, n))
            s, last, n = e, e, 1
        else:
            last = e
            n += 1
    out.append((s, last, n))
    return out


def _drive_step(batches, gap, wm_delay):
    """Feed batches through _sessionize_step with a Spark-like watermark
    (wm = max event time seen in PRIOR batches − delay; events below the
    watermark would have been dropped by Spark, so batches must only
    contain admissible timestamps). Returns (closed, final_state_sizes)."""
    from graphsetintersection_spark.streaming.ingest import _sessionize_step

    state = (-1, 0, [])
    closed_all = []
    sizes = []
    wm = 0
    seen_max = 0
    for batch in batches:
        assert all(t >= wm for t in batch), "test fed an inadmissible event"
        closed, new_state, _ = _sessionize_step(state, batch, wm, gap)
        closed_all.extend(tuple(c) for c in closed)
        state = new_state if new_state is not None else (-1, 0, [])
        sizes.append(len(state[2]))
        seen_max = max([seen_max] + list(batch))
        wm = max(wm, seen_max - wm_delay)
    # final flush: watermark far past everything (the timeout path)
    closed, new_state, _ = _sessionize_step(state, [], seen_max + 10 * gap, gap)
    closed_all.extend(tuple(c) for c in closed)
    assert new_state is None
    return closed_all, sizes


def test_sessionize_step_parity_random_order():
    """Admissible out-of-order arrivals: step output == batch oracle."""
    import random

    rnd = random.Random(7)
    gap, wm_delay = 100, 500
    events = sorted(rnd.randrange(0, 50_000) for _ in range(400))
    # deliver in time-bucketed batches with intra-batch shuffling and
    # small cross-batch disorder (bounded by the watermark delay)
    batches, cur = [], []
    for e in events:
        cur.append(e)
        if len(cur) == 25:
            rnd.shuffle(cur)
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)
    closed, _ = _drive_step(batches, gap, wm_delay)
    assert sorted(closed) == _batch_sessions(events, gap)


def test_sessionize_step_never_idle_key_state_is_bounded():
    """A key whose events keep arriving within gap forever must NOT grow
    state without limit: buffered timestamps stay ≤ the watermark+gap
    horizon's event count, while the open session's (start, n) stays
    exact (ADVICE r3 #1)."""
    gap, wm_delay = 100, 300
    # one event every 50s for 20k steps — a single million-second session
    step = 50
    events = [i * step for i in range(20_000)]
    batches = [events[i : i + 40] for i in range(0, len(events), 40)]
    closed, sizes = _drive_step(batches, gap, wm_delay)
    # horizon = (wm_delay + gap) worth of events + one in-flight batch
    bound = (wm_delay + gap) // step + 41
    assert max(sizes) <= bound, f"state grew to {max(sizes)} (> {bound})"
    assert closed == [(0, events[-1], len(events))]


def test_sessionize_step_prefix_rides_across_many_batches():
    """Session start/count survive arbitrarily many compactions, and a
    session closed mid-stream carries the compacted prefix out with it."""
    gap, wm_delay = 60, 120
    a = [i * 30 for i in range(200)]            # session A: 0..5970
    b = [a[-1] + gap + 1 + i * 30 for i in range(100)]  # session B after gap
    events = a + b
    batches = [events[i : i + 10] for i in range(0, len(events), 10)]
    closed, _ = _drive_step(batches, gap, wm_delay)
    assert closed == _batch_sessions(events, gap)
    assert closed[0] == (0, a[-1], 200)

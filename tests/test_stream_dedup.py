"""Streaming incremental near-dup dedup: batch parity + bounded state.

The streaming operator must emit, over any prefix of the stream, exactly
the batch band-join of those documents against the same historical index
(the stream/batch-agnostic plan makes this testable literally: the same
function runs both)."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY

from graphsetintersection_spark.session import read_table
from graphsetintersection_spark.streaming.dedup import (
    batch_minhash_neardup,
    minhash_band_index,
    start_neardup_sink,
    stream_minhash_neardup,
)

NUM_PERM, BANDS = 64, 16


@pytest.fixture(scope="module")
def corpus(spark):
    """historical docs + an incoming stream containing exact copies,
    near-copies, and fresh documents."""
    base = read_table(spark, SF_TINY, "documents").select("doc_id", "text")
    historical = base.where(F.col("doc_id") < 60).persist()
    exact = base.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = base.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 25)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    fresh = base.where(F.col("doc_id") >= 60).select(
        (F.col("doc_id") + 30000).alias("doc_id"), "text"
    )
    incoming = exact.union(near).union(fresh).persist()
    historical.count(), incoming.count()
    yield historical, incoming
    historical.unpersist()
    incoming.unpersist()


def test_batch_twin_finds_exact_and_near_dups(spark, corpus):
    historical, incoming = corpus
    index = minhash_band_index(historical, NUM_PERM, BANDS).persist()
    try:
        got = {
            (r["doc_id"], r["dup_of"]): r["est_jaccard"]
            for r in batch_minhash_neardup(
                incoming, index, NUM_PERM, BANDS, threshold=0.5
            ).collect()
        }
    finally:
        index.unpersist()
    # every exact copy matches its source with estimate exactly 1.0
    for d in range(10):
        assert got.get((d + 10000, d)) == 1.0
    # near-copies (one appended token) match their source above threshold
    near_hits = [k for k in got if 20000 <= k[0] < 20025 and k[1] == k[0] - 20000]
    assert len(near_hits) >= 12  # LSH banding may miss a band-unlucky few
    # every emitted estimate passed the threshold, and each equals the
    # true slot-agreement fraction of the two signatures (independent
    # recompute — the documents corpus contains organic templated
    # near-dups, so "fresh" docs may legitimately match too)
    assert all(v >= 0.5 for v in got.values())
    from graphsetintersection_spark.functions.dedup import minhash_signatures

    both = incoming.union(
        historical.select((F.col("doc_id") + 0).alias("doc_id"), "text")
    )
    sig = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(both, NUM_PERM, 5).collect()
    }
    for (a, b), v in list(got.items())[:25]:
        agree = sum(x == y for x, y in zip(sig[a], sig[b]))
        assert v == pytest.approx(agree / NUM_PERM)


def test_stream_equals_batch_over_microbatches(spark, corpus, tmp_path):
    """availableNow run over per-file micro-batches == the batch twin on
    the union of the files, and the emitted parquet is append-exact."""
    historical, incoming = corpus
    index = minhash_band_index(historical, NUM_PERM, BANDS).persist()
    src = str(tmp_path / "src")
    os.makedirs(src)
    # three files → maxFilesPerTrigger=1 forces three micro-batches
    parts = [
        incoming.where(F.col("doc_id") < 20005),
        incoming.where((F.col("doc_id") >= 20005) & (F.col("doc_id") < 20015)),
        incoming.where(F.col("doc_id") >= 20015),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(f"{src}/part{i}")
    st = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .load(f"{src}/part*")
    )
    matches = stream_minhash_neardup(st, index, NUM_PERM, BANDS, threshold=0.5)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_neardup_sink(matches, out, ck)
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["dup_of"]): r["est_jaccard"]
        for r in spark.read.parquet(out).collect()
    }
    exp = {
        (r["doc_id"], r["dup_of"]): r["est_jaccard"]
        for r in batch_minhash_neardup(
            incoming, index, NUM_PERM, BANDS, threshold=0.5
        ).collect()
    }
    index.unpersist()
    assert got == exp
    assert len(got) > 0
    # restart with the same checkpoint reprocesses nothing (exactly-once)
    st2 = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string")
        .load(f"{src}/part*")
    )
    q2 = start_neardup_sink(
        stream_minhash_neardup(st2, index, NUM_PERM, BANDS, threshold=0.5),
        out,
        ck,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)


def test_stream_dedup_state_is_watermark_bounded(spark, corpus):
    """The duplicate-collapse must be dropDuplicatesWithinWatermark (state
    ages out), never a bare streaming dropDuplicates (state keeps every
    pair ever emitted)."""
    historical, incoming = corpus
    index = minhash_band_index(historical, NUM_PERM, BANDS)
    st = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("value").alias("doc_id"), F.lit("x").alias("text"))
    )
    matches = stream_minhash_neardup(st, index, NUM_PERM, BANDS)
    plan = matches._jdf.queryExecution().logical().toString()
    assert "dropDuplicatesWithinWatermark" in plan.replace(
        "DeduplicateWithinWatermark", "dropDuplicatesWithinWatermark"
    )
    assert "EventTimeWatermark" in plan


def test_bucketed_index_skips_index_side_exchange(spark, corpus):
    """write_band_index persists the index bucketed on (band, bucket);
    the candidate join must then read it WITHOUT an exchange above the
    index scan (only the incoming side shuffles to match) and produce
    the same matches as the in-memory index."""
    from graphsetintersection_spark.streaming.dedup import (
        read_band_index,
        write_band_index,
    )

    historical, incoming = corpus
    index = minhash_band_index(historical, NUM_PERM, BANDS)
    table = "band_index_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_band_index(index, table, buckets=8)
    try:
        bidx = read_band_index(spark, table)
        out = batch_minhash_neardup(
            incoming, bidx, NUM_PERM, BANDS, threshold=0.5
        )
        got = {(r["doc_id"], r["dup_of"]) for r in out.collect()}
        exp = {
            (r["doc_id"], r["dup_of"])
            for r in batch_minhash_neardup(
                incoming, index, NUM_PERM, BANDS, threshold=0.5
            ).collect()
        }
        assert got == exp and got
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the index-side FileScan reports its bucketing to the planner...
        assert "Bucketed: true" in plan
        # ...and the index side alone plans with no shuffle at all
        idx_plan = bidx._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in idx_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_index_parameter_mismatch_fails_fast(spark, corpus):
    """An index built with different num_perm/bands than the query side
    must raise at query-build time — a mismatch otherwise silently
    empties (bands) or deflates (num_perm) the candidate join and the
    stream reports no duplicates with zero error signal."""
    historical, incoming = corpus
    index = minhash_band_index(historical, num_perm=NUM_PERM, bands=BANDS)
    with pytest.raises(ValueError, match="num_perm"):
        stream_minhash_neardup(
            incoming, index, num_perm=NUM_PERM * 2, bands=BANDS
        )
    with pytest.raises(ValueError, match="bands"):
        stream_minhash_neardup(
            incoming, index, num_perm=NUM_PERM, bands=BANDS * 2
        )
    # matching parameters pass the same validation
    stream_minhash_neardup(incoming, index, num_perm=NUM_PERM, bands=BANDS)
    # an EMPTY index is legitimate (joins to nothing), not a config error
    # — even with parameters that differ from the index's build config
    stream_minhash_neardup(
        incoming, index.where(F.lit(False)), num_perm=8, bands=4
    )

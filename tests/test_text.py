"""Text analysis ops vs Python oracles on the driver documents table."""

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY

from graphsetintersection_spark.functions.text import (
    BPE_TOKEN_RE,
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    LANG_MARKERS,
    doc_stats,
    fingerprint,
    lang_id,
    quality_score,
)
from graphsetintersection_spark.session import read_table


@pytest.fixture(scope="module")
def docs(spark):
    d = read_table(spark, SF_TINY, "documents").persist()
    d.count()
    return d


def test_doc_stats_oracle(spark, docs):
    got = {r["doc_id"]: r for r in doc_stats(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        t = row["text"] or ""
        r = got[row["doc_id"]]
        assert r["n_chars"] == len(t)
        assert r["n_tokens_ws"] == (len(t.split()) if t.strip() else 0), t
        assert r["n_tokens_bpe"] == len(re.findall(BPE_TOKEN_RE, t))
        assert r["n_digits"] == sum(c.isdigit() and c.isascii() for c in t)
        assert r["n_punct"] == sum(c in ".,;:!?" for c in t)


def test_quality_score_bounds(spark, docs):
    rows = quality_score(docs).collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    # longer clean docs should not be all zero
    assert any(r["quality"] > 0.4 for r in rows)


def test_lang_id_oracle(spark, docs):
    def py_lang(t):
        padded = f" {t.lower()} "
        scores = {
            code: sum(padded.count(m) for m in ms)
            for code, ms in LANG_MARKERS.items()
        }
        best = max(scores.values())
        if best == 0:
            return "und"
        return min(c for c, s in scores.items() if s == best)

    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == py_lang(row["text"] or ""), row["doc_id"]
    assert len(set(got.values())) > 1  # discriminates at least two classes


def test_fingerprint_oracle(spark, docs):
    from graphsetintersection_spark.functions.text import FINGERPRINT_MAX_CHARS

    def py_fp(t):
        h, p = 0, 1
        for ch in t[:FINGERPRINT_MAX_CHARS]:
            o = ord(ch)
            code = o if o < 128 else 0  # ascii() semantics: non-ascii→?
            h = (h + code * p) % FINGERPRINT_MOD
            p = (p * FINGERPRINT_BASE) % FINGERPRINT_MOD
        return h

    sample = docs.where(F.col("doc_id") < 50)
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(sample).collect()}
    for row in sample.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == py_fp(row["text"] or ""), row["doc_id"]


def test_fingerprint_caps_long_docs(spark):
    """The fingerprint hashes a fixed prefix (FINGERPRINT_MAX_CHARS) so
    MB-size pages don't allocate O(len) per-row arrays: a 100k-char doc
    fingerprints identically to its 4096-char prefix."""
    from graphsetintersection_spark.functions.text import FINGERPRINT_MAX_CHARS

    long_text = ("abcdefgh " * 12500).strip()  # ~112k chars
    df = spark.createDataFrame(
        [(1, long_text), (2, long_text[:FINGERPRINT_MAX_CHARS])],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert got[1] == got[2]

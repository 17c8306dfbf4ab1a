"""Edge cases the fixture corpus doesn't contain: empty text, single
word, unicode, long repeats — operators must not crash or divide by
zero, and contracts (shingle exclusion, fingerprint stability) hold."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kcore_spark.operators import text as T
from kcore_spark.operators.dedup import simhash, word_shingles


@pytest.fixture(scope="module")
def weird_docs(spark):
    rows = [
        (1, ""),
        (2, "one"),
        (3, "two words"),
        (4, "exactly three words"),
        (5, "café näive 东京 words mixed unicode here"),
        (6, "repeat " * 500),
        (7, "  leading and trailing  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_excludes_short_docs(spark, weird_docs):
    got = word_shingles(weird_docs, "doc_id", "text", 3)
    ids = {r["id"] for r in got.select("id").distinct().collect()}
    assert 1 not in ids and 2 not in ids and 3 not in ids
    assert 4 in ids and 5 in ids and 6 in ids
    # doc 4 has exactly one 3-shingle
    assert got.where("id = 4").count() == 1
    # doc 6 is 500 repeats of one word → exactly one distinct shingle
    assert got.where("id = 6").count() == 1


def test_quality_score_no_nan_or_out_of_range(spark, weird_docs):
    docs = weird_docs.withColumn("n_chars", F.length("text"))
    scores = docs.select(T.quality_score("text", "n_chars").alias("s")).collect()
    for r in scores:
        assert r["s"] is not None
        assert 0.0 <= r["s"] <= 1.0, r


def test_fingerprint_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", T.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]  # same text → same fingerprint
    assert fps[1] != fps[3]  # order matters (rolling hash)
    assert all(0 <= v < T.MOD for v in fps.values())


def test_simhash_handles_weird_docs(spark, weird_docs):
    out = {r["id"]: r["simhash"] for r in simhash(weird_docs, "doc_id", "text", 32).collect()}
    # featureless (empty) docs produce no fingerprint — same contract
    # as the oracle SQL (empty word list → no rows)
    assert set(out) == {2, 3, 4, 5, 6, 7}
    assert all(0 <= v < 2**32 for v in out.values())
    assert out[6] is not None


def test_token_count_unicode(spark, weird_docs):
    got = {r["doc_id"]: r["n"] for r in
           weird_docs.select("doc_id", T.token_count("text").alias("n")).collect()}
    assert got[1] == 0
    assert got[2] == 1
    assert got[3] == 2
    assert got[6] == 500


# ------------------------------------------------ round-4 operator edges


def test_bm25_empty_and_short_docs(spark):
    from kcore_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "spark"), (3, "   ")], "doc_id long, text string"
    )
    rows = {r.id: r for r in bm25_scores(docs, ("spark",)).collect()}
    assert rows[1].dl == 0 and rows[1].score_raw == 0.0
    assert rows[3].dl == 0 and rows[3].score_raw == 0.0
    assert rows[2].score_raw > 0.0


def test_cdc_chunks_short_and_empty_docs(spark):
    from kcore_spark.operators.dedup import cdc_chunks

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "a b c d e")], "doc_id long, text string"
    )
    rows = cdc_chunks(docs, "doc_id", "text").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    assert 1 not in by_doc  # empty doc → no chunks
    assert sum(c.n_words for c in by_doc[2]) == 1
    assert sum(c.n_words for c in by_doc[3]) == 5  # chunks partition the doc


def test_pagerank_empty_edges(spark):
    from kcore_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_fixed_point(edges, 3).count() == 0


def test_quantize_negative_dominant_value(spark):
    from kcore_spark.operators.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [-2.0, 1.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_int8(emb, "embedding", "vec_id").collect()[0]
    # scale = 2/127; q = [-127, 64 (floor(63.5+0.5))]
    assert r.q_l1 == 191 and r.q_sum == -63

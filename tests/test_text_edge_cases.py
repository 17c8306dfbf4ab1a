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

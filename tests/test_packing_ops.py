"""Edge cases for training-sequence assembly: overlapping chunking
boundary math and greedy packing fill rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcore_spark.operators.packing import chunk_documents, pack_greedy


def _chunks(spark, text, size=10, overlap=4):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, "doc_id", "text", size=size, overlap=overlap).orderBy(
        "chunk_idx"
    ).collect()
    return [(r.chunk_idx, r.chunk_text) for r in rows]


def test_chunk_short_doc_single_chunk(spark):
    assert _chunks(spark, "abc") == [(0, "abc")]


def test_chunk_exact_size_single_chunk(spark):
    # covered-stop: chunk 0 reaches the end, no redundant tail chunk
    assert _chunks(spark, "0123456789") == [(0, "0123456789")]


def test_chunk_overlap_shares_chars(spark):
    # stride 6: starts at 1 and 7; chunk 1 reaches the end (covered-stop)
    got = _chunks(spark, "abcdefghijklmno")  # 15 chars
    assert got == [(0, "abcdefghij"), (1, "ghijklmno")]
    # consecutive chunks share the 4-char overlap
    assert got[0][1][-4:] == got[1][1][:4]


def test_chunk_empty_doc_yields_nothing(spark):
    assert _chunks(spark, "") == []


def test_chunk_rejects_overlap_ge_size(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=5, overlap=5)


def _pack(spark, weights, budget):
    rows = [(1, i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "g long, ord long, w long")
    out = pack_greedy(df, "g", "ord", "w", budget=budget).orderBy("ord").collect()
    return [(r.seq_id, r.seq_fill) for r in out]


def test_pack_exact_fit_stays_in_sequence(spark):
    assert _pack(spark, [3, 3, 4], 10) == [(0, 3), (0, 6), (0, 10)]


def test_pack_overflow_starts_new_sequence(spark):
    assert _pack(spark, [6, 6, 6], 10) == [(0, 6), (1, 6), (2, 6)]


def test_pack_oversize_item_owns_a_sequence(spark):
    # a 15-weight item exceeds the whole budget: it fills its own
    # sequence and the next item starts fresh
    assert _pack(spark, [2, 15, 2], 10) == [(0, 2), (1, 15), (2, 2)]


def test_pack_groups_are_independent(spark):
    df = spark.createDataFrame(
        [(1, 0, 8), (1, 1, 8), (2, 0, 8)], "g long, ord long, w long"
    )
    out = {
        (r.g, r.ord): (r.seq_id, r.seq_fill)
        for r in pack_greedy(df, "g", "ord", "w", budget=10).collect()
    }
    assert out == {(1, 0): (0, 8), (1, 1): (1, 8), (2, 0): (0, 8)}


def test_chunk_plan_has_no_shuffle(spark):
    """Chunking must ride the scan: no Exchange in the plan."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.repeat(F.lit("x"), 300).alias("text")
    )
    plan = (
        chunk_documents(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan

"""Ranking/scoring operator properties: BM25, fixed-point PageRank,
int8 quantization (queries/ranking.py's operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcore_spark.operators.graph import pagerank_fixed_point
from kcore_spark.operators.similarity import quantize_int8
from kcore_spark.operators.text import bm25_scores

SCALE = 1_000_000_000_000


def test_bm25_orders_by_term_hits_and_zero_without(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join window spark join spark"),  # many hits
            (2, "spark filler filler filler filler filler"),  # one hit
            (3, "nothing relevant here at all today"),  # zero hits
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: r.score_raw
        for r in bm25_scores(docs, ("spark", "join", "window")).collect()
    }
    assert got[3] == 0.0
    assert got[1] > got[2] > 0.0


def test_bm25_rejects_regex_metacharacter_terms(spark):
    # terms are interpolated into regexp_count patterns on both engines;
    # a metacharacter term must fail loudly, not silently mis-count
    import pytest

    docs = spark.createDataFrame([(1, "c plus plus")], "doc_id long, text string")
    for bad in ("c++", "a.b", "x|y", ""):
        with pytest.raises(ValueError):
            bm25_scores(docs, (bad,))


def test_bm25_length_normalization_prefers_shorter_doc():
    # same tf, different lengths: the shorter doc must score higher
    from kcore_spark.testing import shared_spark

    spark = shared_spark()
    docs = spark.createDataFrame(
        [(1, "spark alpha"), (2, "spark " + " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    got = {r.id: r.score_raw for r in bm25_scores(docs, ("spark",)).collect()}
    assert got[1] > got[2]


def test_pagerank_symmetric_pair_equal_and_hub_wins(spark):
    # star graph: hub 0 linked to 1,2,3 (both directions) — the hub
    # must outrank the leaves, and the leaves must tie exactly
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)], "src long, dst long"
    )
    got = {r.id: r.rank for r in pagerank_fixed_point(edges, iterations=3).collect()}
    assert got[1] == got[2] == got[3]  # exact integer tie
    assert got[0] > got[1]


def test_pagerank_deterministic_across_runs(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20)], "src long, dst long"
    ).where(F.col("src") != F.col("dst"))
    a = sorted((r.id, r.rank) for r in pagerank_fixed_point(edges, 3).collect())
    b = sorted((r.id, r.rank) for r in pagerank_fixed_point(edges, 3).collect())
    assert a == b  # bit-identical, the fixed-point contract


def test_quantize_int8_bounds_and_error(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero guard
            (3, [127.0, -127.0, 63.5, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.id: r for r in quantize_int8(emb, "embedding", "vec_id").collect()}
    # q_l1 bounded by 127 * dims; all-zero vector stays zero
    assert rows[2].q_l1 == 0 and rows[2].q_sum == 0 and rows[2].recon_mse == 0.0
    for r in rows.values():
        assert 0 <= r.q_l1 <= 127 * r.n_dims
    # max|x| always quantizes to ±127 exactly → its recon error is 0;
    # per-dim error is bounded by half a quantization step
    v1 = rows[1]
    step = 1.0 / 127.0  # scale of vector 1 (max|x| = 1.0)
    assert v1.recon_mse <= (step / 2) ** 2 + 1e-12

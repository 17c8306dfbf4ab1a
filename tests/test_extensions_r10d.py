"""Round-10 text-curation block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_perplexity_buckets_partition_corpus(spark):
    """Five buckets partition the corpus; surprisal is monotone
    non-decreasing across buckets (they are score quantiles)."""
    from kcore_spark.queries.extensions_r10d import q_perplexity_buckets

    rows = q_perplexity_buckets(spark, SF_DIR).collect()
    assert [r.bucket for r in rows] == [1, 2, 3, 4, 5]
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    surps = [r.avg_surprisal for r in rows]
    assert surps == sorted(surps)


def test_stopword_density_in_unit_interval(spark):
    from kcore_spark.queries.extensions_r10d import q_stopword_density

    rows = q_stopword_density(spark, SF_DIR).collect()
    assert len(rows) == 5  # five fixture languages
    for r in rows:
        assert 0 <= r.min_density <= r.avg_density <= r.max_density <= 1


def test_vocab_overlap_symmetric_pairs(spark):
    """All C(5,2)=10 unordered language pairs present; Jaccard in
    [0, 1]; intersection bounded by the smaller vocabulary."""
    from kcore_spark.queries.extensions_r10d import q_vocab_overlap_langs

    rows = q_vocab_overlap_langs(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.lang_a < r.lang_b
        assert 0 <= r.jaccard <= 1
        assert r.n_common <= min(r.v_a, r.v_b)


def test_char_class_shares_sum_to_one(spark):
    from kcore_spark.queries.extensions_r10d import q_char_class_profile

    rows = q_char_class_profile(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        total = r.letter_share + r.digit_share + r.space_share + r.other_share
        assert abs(total - 1.0) < 1e-5

"""Round-10 NLP II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_textrank_keywords(spark):
    """15 keywords, positive ranks, descending order."""
    from kcore_spark.queries.extensions_r10bb import q_keyword_textrank

    rows = q_keyword_textrank(spark, SF_DIR).collect()
    assert len(rows) == 15
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank > 0.15 for r in rows)  # above the damping floor


def test_trigram_entropy_ordering(spark):
    """Conditional entropy positive and below the trigram entropy;
    H(bi) <= H(tri) always."""
    from kcore_spark.queries.extensions_r10bb import q_char_trigram_entropy

    rows = q_char_trigram_entropy(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_trigrams > 1000
        assert 0 < r.h_bi <= r.h_tri
        assert 0 <= r.h_conditional <= r.h_tri


def test_pmi_collocations(spark):
    """15 pairs above the count floor; PMI descending."""
    from kcore_spark.queries.extensions_r10bb import q_pmi_collocations

    rows = q_pmi_collocations(spark, SF_DIR).collect()
    assert len(rows) == 15
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r.n_pair >= 20 for r in rows)

"""Round-10 readability/lexical-III block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_smog_plausible(spark):
    from kcore_spark.queries.extensions_r10cb import q_smog_index

    rows = q_smog_index(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        # SMOG has an additive floor of 3.1291
        assert r.avg_smog >= 3.1291


def test_lix_rix_nonnegative(spark):
    from kcore_spark.queries.extensions_r10cb import q_lix_rix

    rows = q_lix_rix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.avg_lix >= 0
        assert r.avg_rix >= 0
        # LIX includes the long-word percentage term, RIX does not scale it
        assert r.avg_lix > r.avg_rix


def test_sttr_range(spark):
    from kcore_spark.queries.extensions_r10cb import q_sttr

    rows = q_sttr(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_segments > 0
        assert 0.0 < r.sttr <= 1.0

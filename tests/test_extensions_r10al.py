"""Round-10 lexical-richness block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_yules_k_positive(spark):
    """Small shared vocabulary -> heavy repetition -> large K."""
    from kcore_spark.queries.extensions_r10al import q_yules_k

    rows = q_yules_k(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_types < r.n_tokens
        assert r.yules_k > 0


def test_diversity_bounds(spark):
    """D in (0,1); H <= ln V (evenness <= 1); H > 0."""
    from kcore_spark.queries.extensions_r10al import q_token_diversity

    rows = q_token_diversity(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r.simpson_d < 1
        assert r.shannon_h > 0
        assert 0 < r.evenness <= 1.000001


def test_hapax_profile_consistency(spark):
    """V1 + V2 <= V; ratios consistent with counts."""
    from kcore_spark.queries.extensions_r10al import q_hapax_profile

    rows = q_hapax_profile(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.v1 + r.v2 <= r.v
        assert abs(r.hapax_ratio - r.v1 / r.v) < 1e-5
        assert abs(r.sichel_s - r.v2 / r.v) < 1e-5

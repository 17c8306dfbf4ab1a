"""Odds-ratio and two-way-ANOVA invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_odds_ratio_ci_brackets_point(spark):
    from kcore_spark.queries.extensions_r9z import q_odds_ratio

    r = q_odds_ratio(spark, SF_DIR).collect()[0]
    total = (
        r.exposed_cases + r.exposed_noncases + r.unexposed_cases + r.unexposed_noncases
    )
    assert total > 0
    if r.odds_ratio is not None:
        assert r.ci_low <= r.odds_ratio <= r.ci_high
        assert r.ci_low > 0


def test_two_way_anova_f_nonnegative(spark):
    """All three F statistics are >= 0 (sums of squares are
    non-negative by construction of the cell-mean decomposition)."""
    from kcore_spark.queries.extensions_r9z import q_two_way_anova

    r = q_two_way_anova(spark, SF_DIR).collect()[0]
    assert r.n > 0
    assert r.f_priority >= 0.0
    assert r.f_status >= 0.0
    # the interaction SS can go slightly negative in the WEIGHTED
    # (unbalanced) decomposition; it must still be near-nonnegative
    assert r.f_interaction > -0.1

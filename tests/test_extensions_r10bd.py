"""Round-10 shrinkage/privacy block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_james_stein_contracts(spark):
    """Shrunk means lie between raw mean and grand mean; factor in
    [0,1]."""
    from kcore_spark.queries.extensions_r10bd import q_james_stein

    rows = q_james_stein(spark, SF_DIR).collect()
    assert len(rows) == 5
    grand = sum(r.raw_mean for r in rows) / len(rows)
    for r in rows:
        assert 0 <= r.shrink_factor <= 1
        lo, hi = sorted([r.raw_mean, grand])
        assert lo - 1e-3 <= r.js_mean <= hi + 1e-3


def test_eb_rates_shrink(spark):
    """EB rates lie between raw rate and the prior mean; bounded."""
    from kcore_spark.queries.extensions_r10bd import q_empirical_bayes_rates

    rows = q_empirical_bayes_rates(spark, SF_DIR).collect()
    assert len(rows) >= 20
    prior = sum(r.raw_rate for r in rows) / len(rows)
    for r in rows:
        assert 0 <= r.eb_rate <= 1
        lo, hi = sorted([r.raw_rate, prior])
        assert lo - 1e-6 <= r.eb_rate <= hi + 1e-6


def test_randomized_response_debias(spark):
    """Debiased rate recovers the true rate within sampling noise;
    observed rate is pulled toward 0.5."""
    from kcore_spark.queries.extensions_r10bd import q_randomized_response

    r = q_randomized_response(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    assert abs(r.debiased_rate - r.true_rate) < 0.05
    assert abs(r.observed_rate - 0.5) <= abs(r.true_rate - 0.5) + 0.02

"""Round-10 commerce II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_revenue_retention_bounds(spark):
    """GRR <= 1 by construction (capped at prior); GRR <= NRR."""
    from kcore_spark.queries.extensions_r10ba import q_revenue_retention

    rows = q_revenue_retention(spark, SF_DIR).collect()
    assert len(rows) > 5
    for r in rows:
        assert r.n_retained > 0
        assert 0 < r.grr <= 1.000001
        assert r.grr <= r.nrr


def test_pareto_share_dominates(spark):
    """Top 20% by revenue always holds more than 20% of revenue."""
    from kcore_spark.queries.extensions_r10ba import q_pareto_share

    r = q_pareto_share(spark, SF_DIR).collect()[0]
    assert 0 < r.n_head < r.n_cust
    assert abs(r.n_head / r.n_cust - 0.2) < 0.05
    assert 0.2 < r.top20_share < 1.0


def test_assoc_measures_bounds(spark):
    """10 pairs; support positive; conviction >= 0."""
    from kcore_spark.queries.extensions_r10ba import q_assoc_measures2

    rows = q_assoc_measures2(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.support > 0
        assert -1 < r.leverage < 1
        assert r.conviction >= 0

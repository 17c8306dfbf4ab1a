"""Round-10 financial-risk block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_var_cvar_tail_order(spark):
    """CVaR (tail mean) is at least as extreme as VaR; tail is ~5%."""
    from kcore_spark.queries.extensions_r10ag import q_var_cvar

    r = q_var_cvar(spark, SF_DIR).collect()[0]
    assert r.n_days > 100
    assert r.cvar_95 <= r.var_95
    assert 0 < r.n_tail <= r.n_days * 0.08


def test_sharpe_sortino_relation(spark):
    """Downside deviation <= total std on a two-sided series, so
    |sortino| >= |sharpe| when the mean is nonzero; both finite."""
    from kcore_spark.queries.extensions_r10ag import q_sharpe_sortino

    r = q_sharpe_sortino(spark, SF_DIR).collect()[0]
    assert r.n_days > 100
    assert abs(r.sharpe) < 50 and abs(r.sortino) < 100
    if r.ann_return != 0:
        assert abs(r.sortino) >= abs(r.sharpe) * 0.5


def test_capm_beta_market_mix(spark):
    """Every nation gets a row; betas are bounded and skew positive
    (each nation co-moves with the market it is part of — attenuated
    below 1 because nation returns live on their own observed-day
    grid, not the market calendar)."""
    from kcore_spark.queries.extensions_r10ag import q_capm_beta

    rows = q_capm_beta(spark, SF_DIR).collect()
    assert len(rows) >= 20
    betas = [r.beta for r in rows]
    assert all(-5 < b < 5 for b in betas)
    assert sum(1 for b in betas if b > 0) > len(betas) * 0.6
    mean_beta = sum(betas) / len(betas)
    assert 0.02 < mean_beta < 2.5

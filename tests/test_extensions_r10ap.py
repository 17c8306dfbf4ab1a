"""Round-10 categorical-association block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_cramers_v_bounds(spark):
    """V in [0,1); independent-ish fixture columns stay small."""
    from kcore_spark.queries.extensions_r10ap import q_cramers_v

    r = q_cramers_v(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    assert r.r_cats == 5 and r.c_cats == 5
    assert r.chi2 >= 0
    assert 0 <= r.cramers_v < 0.5


def test_gk_gamma_bounds(spark):
    """Gamma in [-1,1]; price and quantity bands are positively
    related in TPC-H-ish data (price ~ qty x unit price)."""
    from kcore_spark.queries.extensions_r10ap import q_gk_gamma

    r = q_gk_gamma(spark, SF_DIR).collect()[0]
    assert r.concordant > 0 and r.discordant > 0
    assert -1 <= r.gk_gamma <= 1


def test_uncertainty_coeff_bounds(spark):
    """0 <= U <= 1; conditioning can only reduce entropy."""
    from kcore_spark.queries.extensions_r10ap import q_uncertainty_coeff

    r = q_uncertainty_coeff(spark, SF_DIR).collect()[0]
    assert r.h_y > 0
    assert r.h_y_given_x <= r.h_y + 1e-9
    assert 0 <= r.uncertainty_coeff <= 1

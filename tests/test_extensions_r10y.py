"""Round-10 count-data block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_rate_ratio_interval_brackets(spark):
    from kcore_spark.queries.extensions_r10y import q_poisson_rate_ratio

    r = q_poisson_rate_ratio(spark, SF_DIR).collect()[0]
    assert r.n_click > 0 and r.n_error > 0
    assert r.rr_lo95 <= r.rate_ratio <= r.rr_hi95
    assert abs(r.rate_ratio - r.n_click / r.n_error) < 1e-4


def test_nb_overdispersion_consistency(spark):
    """nb_size_r present iff dispersion_index > 1."""
    from kcore_spark.queries.extensions_r10y import q_nb_overdispersion

    rows = q_nb_overdispersion(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.mean_daily > 0
        assert r.dispersion_index > 0
        if r.dispersion_index > 1:
            assert r.nb_size_r is not None and r.nb_size_r > 0
        else:
            assert r.nb_size_r is None


def test_fisher_combined_positive(spark):
    from kcore_spark.queries.extensions_r10y import q_fisher_combined

    r = q_fisher_combined(spark, SF_DIR).collect()[0]
    assert r.m_hypotheses == 25
    assert r.chi2_df == 50
    assert r.fisher_x2 > 0

"""Round-10 survey-sampling estimator block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_horvitz_thompson_unbiasedness(spark):
    """HT estimate within 15% of the exact total; sample nonempty and
    smaller than the population."""
    from kcore_spark.queries.extensions_r10au import q_horvitz_thompson

    r = q_horvitz_thompson(spark, SF_DIR).collect()[0]
    assert 0 < r.n_sample < r.n_pop
    assert 0.85 < r.est_over_exact < 1.15


def test_ratio_estimator_close(spark):
    """Ratio estimate within 20% of exact on the 10% sample."""
    from kcore_spark.queries.extensions_r10au import q_ratio_estimator

    r = q_ratio_estimator(spark, SF_DIR).collect()[0]
    assert r.n_sample > 20
    assert 0.8 < r.est_over_exact < 1.2


def test_regression_estimator_close(spark):
    """GREG estimate within 20% of exact; slope finite."""
    from kcore_spark.queries.extensions_r10au import q_regression_estimator

    r = q_regression_estimator(spark, SF_DIR).collect()[0]
    assert r.n_sample > 20
    assert abs(r.slope) < 1e6
    assert 0.8 < r.est_over_exact < 1.2

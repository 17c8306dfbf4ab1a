"""Round-10 panel-econometrics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_fixed_effects_positive(spark):
    """More orders in a month -> more revenue within a customer."""
    from kcore_spark.queries.extensions_r10bj import q_fixed_effects

    r = q_fixed_effects(spark, SF_DIR).collect()[0]
    assert r.n > 100
    assert r.beta_within > 0


def test_between_positive(spark):
    """Customers averaging more orders/month average more revenue."""
    from kcore_spark.queries.extensions_r10bj import q_between_estimator

    r = q_between_estimator(spark, SF_DIR).collect()[0]
    assert r.n > 50
    assert r.beta_between > 0


def test_first_difference_positive(spark):
    """Month-over-month order growth moves revenue the same way."""
    from kcore_spark.queries.extensions_r10bj import q_first_difference

    r = q_first_difference(spark, SF_DIR).collect()[0]
    assert r.n > 20
    assert r.beta_fd > 0

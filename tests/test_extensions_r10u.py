"""Round-10 operations-research block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_littles_law_identity(spark):
    """L = lambda * W exactly when all three are measured on the same
    window — the ratio must be 1."""
    from kcore_spark.queries.extensions_r10u import q_littles_law

    r = q_littles_law(spark, SF_DIR).collect()[0]
    assert r.n_orders > 0
    assert abs(r.littles_ratio - 1.0) < 1e-4
    assert r.w_days >= 1  # every order spends at least its start day


def test_newsvendor_above_mean(spark):
    """The 0.75 fractile is >= the median; for the fixture's demand it
    should also be >= 0 and finite."""
    from kcore_spark.queries.extensions_r10u import q_newsvendor_quantile

    rows = q_newsvendor_quantile(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.newsvendor_qty > 0
        assert r.n_days > 0


def test_eoq_monotone_in_demand(spark):
    """EOQ grows with annualized demand (sqrt-monotone): the top-10
    list ordered by EOQ is also ordered by demand."""
    from kcore_spark.queries.extensions_r10u import q_eoq

    rows = q_eoq(spark, SF_DIR).collect()
    assert rows
    demands = [r.annualized_demand for r in rows]
    assert demands == sorted(demands, reverse=True)
    for r in rows:
        assert r.eoq > 0

"""Round-10 optimization/robust-fit block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_knapsack_certificate(spark):
    """LP bound dominates the greedy value; gap is small (density
    greedy is near-optimal when items are small vs budget)."""
    from kcore_spark.queries.extensions_r10bl import q_knapsack_bound

    r = q_knapsack_bound(spark, SF_DIR).collect()[0]
    assert r.n_taken > 10
    assert r.lp_bound >= r.greedy_value
    assert 0 <= r.max_gap < 0.05


def test_lad_close_to_huber_family(spark):
    """LAD slope finite and same sign territory as OLS on this data."""
    from kcore_spark.queries.extensions_r10bl import q_lad_regression

    r = q_lad_regression(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    assert abs(r.lad_slope) < 1e4
    assert abs(r.lad_intercept) < 1e6


def test_haversine_symmetric_nearest(spark):
    """25 rows; distances positive and below half Earth circumference."""
    from kcore_spark.queries.extensions_r10bl import q_haversine_nearest

    rows = q_haversine_nearest(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.nearest_nation != r.n_name
        assert 0 <= r.distance_km <= 20016

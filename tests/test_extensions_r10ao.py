"""Round-10 forecasting-methods block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_forecast_accuracy_shape(spark):
    """Three methods, 28 test points each, finite positive errors."""
    from kcore_spark.queries.extensions_r10ao import q_forecast_accuracy

    rows = q_forecast_accuracy(spark, SF_DIR).collect()
    assert [r.method for r in rows] == ["1_naive", "2_snaive", "3_drift"]
    for r in rows:
        assert r.h == 28
        assert r.mae > 0
        assert r.rmse >= r.mae  # RMSE dominates MAE always
        assert 0 < r.smape < 2


def test_croston_rates_positive(spark):
    """Every brand: positive demand rate (sizes/interval in units/day);
    rate below the mean nonzero size (interval >= 1 day)."""
    from kcore_spark.queries.extensions_r10ao import q_croston

    rows = q_croston(spark, SF_DIR).collect()
    assert len(rows) >= 20
    for r in rows:
        assert r.n_parts > 0
        assert r.avg_demand_rate > 0


def test_theta_between_components(spark):
    """Theta forecast is the midpoint of SES and trend forecasts."""
    from kcore_spark.queries.extensions_r10ao import q_theta_method

    r = q_theta_method(spark, SF_DIR).collect()[0]
    assert r.n_days > 100
    lo = min(r.ses_forecast, r.trend_forecast)
    hi = max(r.ses_forecast, r.trend_forecast)
    assert lo <= r.theta_forecast <= hi
    assert abs(r.theta_forecast - (r.ses_forecast + r.trend_forecast) / 2) < 1e-4

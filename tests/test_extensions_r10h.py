"""Round-10 forecasting block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_holt_winters_five_types(spark):
    from kcore_spark.queries.extensions_r10h import q_holt_winters

    rows = q_holt_winters(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_steps > 24  # at least one full season plus updates
        assert r.level > 0  # value means are positive in the fixture


def test_theil_u2_consistency(spark):
    """U2 equals the ratio of the two reported RMSEs."""
    from kcore_spark.queries.extensions_r10h import q_theil_u2

    r = q_theil_u2(spark, SF_DIR).collect()[0]
    assert r.n_days > 10
    assert r.rmse_drift_rel > 0 and r.rmse_naive_rel > 0
    assert abs(r.theil_u2 - r.rmse_drift_rel / r.rmse_naive_rel) < 1e-4


def test_pacf_lag1_equals_acf1(spark):
    from kcore_spark.queries.extensions_r8g_stats import q_acf_hourly
    from kcore_spark.queries.extensions_r10h import q_pacf

    p = q_pacf(spark, SF_DIR).collect()[0]
    acf = {r.lag: r.acf for r in q_acf_hourly(spark, SF_DIR).collect()}
    assert abs(p.pacf_1 - acf[1]) < 1e-7
    for v in (p.pacf_1, p.pacf_2, p.pacf_3):
        assert -1.0 <= v <= 1.0

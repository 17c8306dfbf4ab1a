"""Round-10 technical-series block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_ljung_box_consistent_with_acf(spark):
    """LB recomputes from the registered ACF rows exactly (composition
    consistency); Q >= 0."""
    from kcore_spark.queries.extensions_r8g_stats import q_acf_hourly
    from kcore_spark.queries.extensions_r10c import q_ljung_box

    lb = q_ljung_box(spark, SF_DIR).collect()[0]
    acf = q_acf_hourly(spark, SF_DIR).collect()
    n = max(r.n_pairs + r.lag for r in acf)
    expect = n * (n + 2) * sum(r.acf**2 / r.n_pairs for r in acf)
    assert lb.n_hours == n
    assert lb.n_lags == len(acf)
    assert abs(lb.ljung_box_q - expect) < 1e-4
    assert lb.ljung_box_q >= 0


def test_bollinger_counts_bounded(spark):
    from kcore_spark.queries.extensions_r10c import q_bollinger_bands

    r = q_bollinger_bands(spark, SF_DIR).collect()[0]
    assert r.n_evaluated > 0
    assert 0 <= r.n_breakout_up + r.n_breakout_down <= r.n_evaluated
    assert r.avg_band_width > 0


def test_rsi_in_range(spark):
    from kcore_spark.queries.extensions_r10c import q_rsi_simple

    r = q_rsi_simple(spark, SF_DIR).collect()[0]
    assert r.n_evaluated > 0
    assert 0 <= r.avg_rsi <= 100
    assert 0 <= r.last_rsi <= 100
    assert r.n_overbought + r.n_oversold <= r.n_evaluated

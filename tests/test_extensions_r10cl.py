"""Round-10 financial-risk-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_omega_positive(spark):
    from kcore_spark.queries.extensions_r10cl import q_omega_ratio

    r = q_omega_ratio(spark, SF_DIR).collect()[0]
    assert r.gain_area >= 0 and r.loss_area >= 0
    assert r.omega > 0


def test_ulcer_bounds(spark):
    from kcore_spark.queries.extensions_r10cl import q_ulcer_index

    r = q_ulcer_index(spark, SF_DIR).collect()[0]
    assert r.ulcer_index >= 0
    assert r.worst_drawdown_pct <= 0
    assert r.avg_drawdown_pct <= 0
    # RMS dominates the mean of the absolute drawdowns
    assert r.ulcer_index >= -r.avg_drawdown_pct - 1e-9


def test_kelly_identity(spark):
    from kcore_spark.queries.extensions_r10cl import q_kelly_fraction

    r = q_kelly_fraction(spark, SF_DIR).collect()[0]
    assert 0.0 < r.win_rate < 1.0
    assert r.payoff_ratio > 0
    expect = r.win_rate - (1 - r.win_rate) / r.payoff_ratio
    assert math.isclose(r.kelly_fraction, expect, abs_tol=1e-4)

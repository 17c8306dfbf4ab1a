"""Round-10 randomness-battery block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_von_neumann(spark):
    from kcore_spark.queries.extensions_r10db import q_von_neumann_ratio

    r = q_von_neumann_ratio(spark, SF_DIR).collect()[0]
    assert r.von_neumann_ratio > 0
    assert math.isfinite(r.z_score)
    assert 0.0 <= r.p_two_sided <= 1.0


def test_turning_points(spark):
    from kcore_spark.queries.extensions_r10db import q_turning_points_test

    r = q_turning_points_test(spark, SF_DIR).collect()[0]
    assert 0 <= r.n_tp <= r.n - 2
    assert abs(r.expected_tp - 2 * (r.n - 2) / 3) < 0.01
    assert 0.0 <= r.p_two_sided <= 1.0


def test_weekday_amplitude(spark):
    from kcore_spark.queries.extensions_r10db import q_weekday_amplitude

    r = q_weekday_amplitude(spark, SF_DIR).collect()[0]
    assert 1 <= r.peak_weekday <= 7
    assert 1 <= r.trough_weekday <= 7
    assert r.peak_mean >= r.trough_mean
    assert r.relative_amplitude >= 0

"""Round-10 experimentation-IV block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_novelty_trend(spark):
    from kcore_spark.queries.extensions_r10cs import q_novelty_trend

    r = q_novelty_trend(spark, SF_DIR).collect()[0]
    assert r.n_days > 10
    assert math.isfinite(r.lift_trend_per_day)
    assert 0.0 <= r.p_approx <= 1.0


def test_ab_attrition(spark):
    from kcore_spark.queries.extensions_r10cs import q_ab_attrition

    r = q_ab_attrition(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.retention_treat <= 1.0
    assert 0.0 <= r.retention_ctrl <= 1.0
    # arms are a hash split: retention should be broadly similar
    assert abs(r.z_attrition) < 10
    assert 0.0 <= r.p_two_sided <= 1.0


def test_peeking_path(spark):
    from kcore_spark.queries.extensions_r10cs import q_peeking_path

    r = q_peeking_path(spark, SF_DIR).collect()[0]
    assert r.n_days > 10
    assert math.isfinite(r.final_z)
    if r.naive_peek_would_stop:
        assert 1 <= r.first_crossing_day <= r.n_days
    else:
        assert r.first_crossing_day is None

"""Round-10 changepoint-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_pettitt_bounds(spark):
    from kcore_spark.queries.extensions_r10bx import q_pettitt_test

    r = q_pettitt_test(spark, SF_DIR).collect()[0]
    assert r.n_days > 10
    assert r.k_stat >= 0
    assert 0.0 <= r.p_approx <= 1.0


def test_binseg_gain(spark):
    from kcore_spark.queries.extensions_r10bx import q_binseg_sse

    r = q_binseg_sse(spark, SF_DIR).collect()[0]
    # splitting can never increase total SSE
    assert r.sse_split <= r.sse_total + 0.01
    assert 0.0 <= r.gain_pct <= 100.0


def test_variance_changepoint(spark):
    from kcore_spark.queries.extensions_r10bx import q_variance_changepoint

    r = q_variance_changepoint(spark, SF_DIR).collect()[0]
    # the best split's LL gain is nonnegative (split at least as good)
    assert r.ll_gain >= -1e-6
    assert r.var_left > 0 and r.var_right > 0

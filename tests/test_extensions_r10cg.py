"""Round-10 regression-diagnostics-III block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_white_bounds(spark):
    from kcore_spark.queries.extensions_r10cg import q_white_test

    r = q_white_test(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.aux_r2 <= 1.0
    assert r.lm_white >= 0
    assert 0.0 <= r.p_value <= 1.0
    assert r.df == 2


def test_bg_bounds(spark):
    from kcore_spark.queries.extensions_r10cg import q_breusch_godfrey

    r = q_breusch_godfrey(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.aux_r2 <= 1.0
    assert r.lm_bg >= 0
    assert 0.0 <= r.p_value <= 1.0


def test_reset_bounds(spark):
    from kcore_spark.queries.extensions_r10cg import q_ramsey_reset

    r = q_ramsey_reset(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.aux_r2 <= 1.0
    assert r.lm_reset >= 0
    assert 0.0 <= r.p_value <= 1.0

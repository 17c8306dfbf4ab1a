"""Round-10 survey-design-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_icc_deff(spark):
    from kcore_spark.queries.extensions_r10ci import q_icc_design_effect

    r = q_icc_design_effect(spark, SF_DIR).collect()[0]
    assert r.n_clusters == 25
    assert -1.0 <= r.icc <= 1.0
    assert r.deff > 0
    assert 0 < r.n_effective <= r.n_units * 2  # deff < 0.5 would be odd


def test_kish_neff(spark):
    from kcore_spark.queries.extensions_r10ci import q_kish_neff

    r = q_kish_neff(spark, SF_DIR).collect()[0]
    assert 0 < r.kish_neff <= r.n
    assert 0.0 < r.efficiency <= 1.0
    assert r.deff_weights >= 1.0


def test_weight_trimming_efficiency(spark):
    from kcore_spark.queries.extensions_r10ci import q_weight_trimming

    r = q_weight_trimming(spark, SF_DIR).collect()[0]
    assert 0 <= r.n_trimmed < r.n
    # trimming weights can only raise (or keep) Kish efficiency
    assert r.efficiency_trimmed >= r.efficiency_raw - 1e-9
    assert 0.0 < r.efficiency_trimmed <= 1.0

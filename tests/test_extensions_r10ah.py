"""Round-10 agreement/reliability block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_fleiss_kappa_bounds(spark):
    """Correlated raters: kappa above chance but below perfect."""
    from kcore_spark.queries.extensions_r10ah import q_fleiss_kappa

    r = q_fleiss_kappa(spark, SF_DIR).collect()[0]
    assert r.n_subjects > 100
    assert 0 < r.p_e < 1
    assert r.p_e < r.p_bar <= 1
    assert 0 < r.fleiss_kappa < 1


def test_cronbach_alpha_bounds(spark):
    """Independent-ish quantity items: alpha well below 1, finite."""
    from kcore_spark.queries.extensions_r10ah import q_cronbach_alpha

    r = q_cronbach_alpha(spark, SF_DIR).collect()[0]
    assert r.k == 4
    assert r.n_subjects > 50
    assert r.sum_item_var > 0 and r.total_var > 0
    assert -1 < r.cronbach_alpha < 1


def test_mcc_noisy_predictor(spark):
    """80/20 asymmetric-noise predictor: MCC clearly positive but
    clearly imperfect; confusion cells cover the population."""
    from kcore_spark.queries.extensions_r10ah import q_mcc

    r = q_mcc(spark, SF_DIR).collect()[0]
    assert r.tp > 0 and r.tn > 0 and r.fp > 0 and r.fn > 0
    assert 0.3 < r.mcc < 0.9

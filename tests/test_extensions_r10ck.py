"""Round-10 calibration-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_hosmer_lemeshow(spark):
    from kcore_spark.queries.extensions_r10ck import q_hosmer_lemeshow

    r = q_hosmer_lemeshow(spark, SF_DIR).collect()[0]
    assert r.n_groups == 10 and r.df == 8
    assert r.hl_chi2 >= 0


def test_spiegelhalter(spark):
    from kcore_spark.queries.extensions_r10ck import q_spiegelhalter_z

    r = q_spiegelhalter_z(spark, SF_DIR).collect()[0]
    assert math.isfinite(r.z_spiegelhalter)
    assert 0.0 <= r.p_two_sided <= 1.0


def test_bss(spark):
    from kcore_spark.queries.extensions_r10ck import q_brier_skill_score

    r = q_brier_skill_score(spark, SF_DIR).collect()[0]
    assert 0.0 < r.base_rate < 1.0
    assert 0.0 <= r.brier <= 1.0
    assert r.bss <= 1.0  # perfect model bound

"""Round-10 stratified-contingency block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_mantel_haenszel_bounds(spark):
    from kcore_spark.queries.extensions_r10bs import q_mantel_haenszel

    r = q_mantel_haenszel(spark, SF_DIR).collect()[0]
    assert r.n_strata == 5
    assert r.or_mh > 0
    assert r.cmh_chi2 >= 0
    assert 0.0 <= r.p_value <= 1.0


def test_cochran_armitage_moments(spark):
    from kcore_spark.queries.extensions_r10bs import q_cochran_armitage

    r = q_cochran_armitage(spark, SF_DIR).collect()[0]
    assert r.n_doses == 5
    assert 0 < r.n_success < r.n_total
    assert math.isfinite(r.z_trend)
    assert 0.0 <= r.p_two_sided <= 1.0


def test_woolf_homogeneity(spark):
    from kcore_spark.queries.extensions_r10bs import q_woolf_homogeneity

    r = q_woolf_homogeneity(spark, SF_DIR).collect()[0]
    assert r.n_strata == 5 and r.df == 4
    assert r.chi2_woolf >= 0
    assert math.isfinite(r.pooled_ln_or)

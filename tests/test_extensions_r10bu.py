"""Round-10 concordance/agreement-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_krippendorff_alpha_range(spark):
    from kcore_spark.queries.extensions_r10bu import q_krippendorff_alpha

    r = q_krippendorff_alpha(spark, SF_DIR).collect()[0]
    assert r.n_units > 0 and r.n_ratings >= 2 * r.n_units
    assert -1.0 <= r.alpha <= 1.0


def test_kendalls_w_range(spark):
    from kcore_spark.queries.extensions_r10bu import q_kendalls_w

    r = q_kendalls_w(spark, SF_DIR).collect()[0]
    assert r.n_raters == 5 and r.n_objects == 25
    assert 0.0 <= r.kendalls_w <= 1.0
    assert abs(r.chi2 - 5 * 24 * r.kendalls_w) < 1e-3


def test_somers_d_range(spark):
    from kcore_spark.queries.extensions_r10bu import q_somers_d

    r = q_somers_d(spark, SF_DIR).collect()[0]
    assert r.n_c > 0 and r.n_d > 0
    assert -1.0 <= r.somers_d_yx <= 1.0
    # pair identity: C + D <= untied-on-X pairs
    assert r.n_c + r.n_d <= r.n * (r.n - 1) // 2

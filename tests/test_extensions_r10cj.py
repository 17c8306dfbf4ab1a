"""Round-10 robust-nonparametrics-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_hodges_lehmann_pairs(spark):
    from kcore_spark.queries.extensions_r10cj import q_hodges_lehmann, _diffs

    n = _diffs(spark, SF_DIR).count()
    r = q_hodges_lehmann(spark, SF_DIR).collect()[0]
    assert r.n_pairs == n * (n + 1) // 2  # Walsh pairs i <= j
    assert math.isfinite(r.hl_daily_change)


def test_sign_test_bounds(spark):
    from kcore_spark.queries.extensions_r10cj import q_sign_test

    r = q_sign_test(spark, SF_DIR).collect()[0]
    assert r.n_pos + r.n_zero <= r.n_pairs
    assert 0.0 <= r.p_two_sided <= 1.0


def test_mood_median(spark):
    from kcore_spark.queries.extensions_r10cj import q_mood_median_test

    r = q_mood_median_test(spark, SF_DIR).collect()[0]
    assert r.k == 5 and r.df == 4
    assert r.chi2_mood >= 0

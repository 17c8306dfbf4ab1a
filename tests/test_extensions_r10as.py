"""Round-10 robust-statistics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_huber_between_median_and_mean(spark):
    """Huber location lands inside the data range with positive scale;
    finite after 3 rounds."""
    from kcore_spark.queries.extensions_r10as import q_huber_m

    r = q_huber_m(spark, SF_DIR).collect()[0]
    assert r.n > 100
    assert -1000 < r.huber_location < 10000
    assert r.scale_mad > 0


def test_biweight_vs_classical(spark):
    """Robust scale positive and below the full range."""
    from kcore_spark.queries.extensions_r10as import q_biweight_midvariance

    r = q_biweight_midvariance(spark, SF_DIR).collect()[0]
    assert r.n > 100
    assert r.biweight_midvariance > 0
    assert abs(r.biweight_midsd**2 - r.biweight_midvariance) < 1.0


def test_median_ci_brackets_median(spark):
    """ci_lo <= median <= ci_hi; ranks ordered; interval nonempty."""
    from kcore_spark.queries.extensions_r10as import q_median_ci

    r = q_median_ci(spark, SF_DIR).collect()[0]
    assert 1 <= r.lo_rank < r.hi_rank <= r.n
    assert r.ci_lo <= r.median <= r.ci_hi

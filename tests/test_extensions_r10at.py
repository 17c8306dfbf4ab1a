"""Round-10 sketch-estimator block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_ams_f2_in_range(spark):
    """Mean of 16 AMS estimators lands within 3x of exact F2 (the
    estimator variance is 2·F2²/16 -> sd ~0.35·F2)."""
    from kcore_spark.queries.extensions_r10at import q_ams_f2

    r = q_ams_f2(spark, SF_DIR).collect()[0]
    assert r.f2_exact > 0
    assert 0.2 < r.est_over_exact < 3.0


def test_kmv_distinct_close(spark):
    """Bottom-64 estimate within ~40% of exact (rel err ~1/sqrt(k))."""
    from kcore_spark.queries.extensions_r10at import q_kmv_distinct

    r = q_kmv_distinct(spark, SF_DIR).collect()[0]
    assert r.k == 64
    assert r.d_exact > 64
    assert 0.6 < r.est_over_exact < 1.6


def test_linear_counting_close(spark):
    """Bitmap estimate within 15% of exact while load factor sane."""
    from kcore_spark.queries.extensions_r10at import q_linear_counting

    r = q_linear_counting(spark, SF_DIR).collect()[0]
    assert 0 < r.occupied_buckets < 1024
    assert 0.85 < r.est_over_exact < 1.15

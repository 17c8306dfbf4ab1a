"""Round-10 retention-science block invariants."""

from __future__ import annotations

from .conftest import SF_DIR_MED


def test_sbg_fit(spark):
    from kcore_spark.queries.extensions_r10cy import q_sbg_retention_fit

    r = q_sbg_retention_fit(spark, SF_DIR_MED).collect()[0]
    assert 0.0 < r.r1_observed <= 1.0
    assert 0.0 < r.r2_observed <= 1.0
    assert r.sbg_a > 0 and r.sbg_b > 0
    assert 0.0 <= r.r12_projected <= 1.0


def test_mcf_monotone(spark):
    from kcore_spark.queries.extensions_r10cy import q_mean_cumulative_function

    rows = q_mean_cumulative_function(spark, SF_DIR_MED).collect()
    assert rows
    ms = [r.mcf for r in rows]
    assert ms == sorted(ms)  # cumulative
    for r in rows:
        assert r.n_risk > 0 and r.d >= 0


def test_cohort_quality(spark):
    from kcore_spark.queries.extensions_r10cy import q_cohort_quality_trend

    r = q_cohort_quality_trend(spark, SF_DIR_MED).collect()[0]
    assert r.n_cohorts > 5
    assert 0.0 <= r.mean_m1_retention <= 1.0

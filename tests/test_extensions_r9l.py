"""Structural invariants of the round-9 batch-L additions (Wilcoxon,
log-rank, Theil-Sen)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_wilcoxon_w_in_range(spark):
    """0 <= W+ <= n(n+1)/2, and the z-statistic is finite."""
    import math

    from kcore_spark.queries.extensions_r9l import q_wilcoxon_signed_rank

    r = q_wilcoxon_signed_rank(spark, SF_DIR).collect()[0]
    assert r.n_pairs > 0
    assert 0.0 <= r.w_plus <= r.n_pairs * (r.n_pairs + 1) / 2
    assert math.isfinite(r.z_stat)


def test_logrank_chi2_nonnegative_and_balanced_expectation(spark):
    """chi² >= 0; with the md5 half-split the expected count for arm 1
    must be within a factor of the observed total (sanity of the
    hypergeometric expectation), and observed_1 <= total events."""
    from kcore_spark.queries.extensions_r9l import q_logrank_test

    r = q_logrank_test(spark, SF_DIR).collect()[0]
    assert r.chi2 >= 0.0
    assert r.n_event_times > 0
    assert r.observed_1 >= 0
    assert r.expected_1 > 0
    # null-ish split: observed within 3x of expected either way
    assert r.expected_1 / 3 < max(r.observed_1, 1) < r.expected_1 * 3


def test_theil_sen_bounded_pairs_and_robustness(spark):
    """Per-group pair count never exceeds C(60,2) (the sample bound —
    THE scale property), and the slope is finite."""
    import math

    from kcore_spark.queries.extensions_r9l import q_theil_sen

    rows = q_theil_sen(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r.n_pairs <= 60 * 59 // 2
        assert math.isfinite(r.theil_sen_slope)

"""Round-10 sequential/rank-test block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_page_hinkley_nonnegative(spark):
    """PH statistic is non-negative by construction; n_days sane."""
    from kcore_spark.queries.extensions_r10av import q_page_hinkley

    r = q_page_hinkley(spark, SF_DIR).collect()[0]
    assert r.n_days > 10
    assert r.max_ph >= 0
    # alarm (if fired) lies within the observed window
    if r.alarm_epoch is not None:
        assert r.alarm_epoch > 1_500_000_000


def test_friedman_nonnegative(spark):
    """Rank sums over complete weeks; chi2 >= 0 (can exceed 0 even
    under the null); block count positive."""
    from kcore_spark.queries.extensions_r10av import q_friedman_seasonality

    r = q_friedman_seasonality(spark, SF_DIR).collect()[0]
    assert r.n_blocks >= 3
    # total rank mass per block is 28 (=1+..+7); sum over dows of rsum
    # equals 28*n_blocks, so sr2 >= (28n/7)^2*7 by Cauchy-Schwarz
    assert r.sum_rank_sq >= 7 * (4.0 * r.n_blocks) ** 2 - 1e-6
    assert r.friedman_chi2 >= -1e-9


def test_yuen_trimmed_t(spark):
    """Trimmed means positive; null-ish split keeps |t| moderate."""
    from kcore_spark.queries.extensions_r10av import q_yuen_test

    r = q_yuen_test(spark, SF_DIR).collect()[0]
    assert r.h1 > 50 and r.h2 > 100
    assert r.trimmed_mean_urgent > 0 and r.trimmed_mean_other > 0
    assert abs(r.yuen_t) < 10

"""Round-10 robust-statistics / extreme-value block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_grubbs_peak_is_max_deviation(spark):
    """G > 0; the reported peak day's count is the farthest from the
    mean (re-derivable from the output row itself)."""
    from kcore_spark.queries.extensions_r10 import q_grubbs_outlier

    r = q_grubbs_outlier(spark, SF_DIR).collect()[0]
    assert r.n > 1
    assert r.grubbs_g > 0
    assert abs(r.peak_count - r.mean_count) > 0


def test_tukey_whiskers_inside_data(spark):
    """Whisker ends are non-outliers: lo <= q1, hi >= q3; outlier
    counts are bounded by n."""
    from kcore_spark.queries.extensions_r10 import q_tukey_fences

    rows = q_tukey_fences(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q3
        assert r.whisker_lo <= r.q1
        assert r.whisker_hi >= r.q3
        assert 0 <= r.n_low_outliers + r.n_high_outliers < r.n


def test_gumbel_fit_sane(spark):
    """beta > 0; the 30-day return level exceeds mu (T > e); the CDF
    at the observed max is a probability."""
    from kcore_spark.queries.extensions_r10 import q_gumbel_extremes

    r = q_gumbel_extremes(spark, SF_DIR).collect()[0]
    assert r.n_days > 1
    assert r.gumbel_beta > 0
    assert r.return_level_30d > r.gumbel_mu
    assert 0.0 <= r.cdf_at_observed_max <= 1.0

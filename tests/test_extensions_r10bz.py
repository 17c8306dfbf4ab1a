"""Round-10 spectral-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_spectral_entropy_range(spark):
    from kcore_spark.queries.extensions_r10bz import q_spectral_entropy

    r = q_spectral_entropy(spark, SF_DIR).collect()[0]
    assert r.m_freqs >= 10
    assert 0.0 <= r.spectral_entropy <= 1.0 + 1e-9


def test_fisher_g_bounds(spark):
    from kcore_spark.queries.extensions_r10bz import q_fisher_g_test

    r = q_fisher_g_test(spark, SF_DIR).collect()[0]
    # g in [1/m, 1]
    assert 1.0 / r.m_freqs - 1e-9 <= r.g_stat <= 1.0
    assert 0.0 <= r.p_approx <= 1.0
    assert 1 <= r.peak_j <= r.m_freqs
    assert r.peak_period_days >= 2.0  # Nyquist


def test_segment_psd_rows(spark):
    from kcore_spark.queries.extensions_r10bz import q_segment_avg_psd

    rows = q_segment_avg_psd(spark, SF_DIR).collect()
    assert [r.period_days for r in rows] == [3.5, 7.0, 14.0, 30.0]
    for r in rows:
        assert r.n_segments == 4
        assert r.mean_power >= 0
        assert r.cv_across_segments >= 0

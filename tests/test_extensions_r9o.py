"""Structural invariants of the round-9 batch-O diagnostics
(Jarque-Bera, two-proportion z, runs test, Durbin-Watson)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_jarque_bera_matches_numpy_moments(spark):
    """Skewness/kurtosis agree with numpy-derived moments (third
    engine) and JB >= 0 always."""
    import duckdb
    import numpy as np

    from kcore_spark.queries.extensions_r9o import q_jarque_bera

    r = q_jarque_bera(spark, SF_DIR).collect()[0]
    assert r.jb_stat >= 0.0
    x = duckdb.sql(
        f"SELECT o_totalprice FROM '{SF_DIR}/orders.parquet'"
    ).df()["o_totalprice"].to_numpy()
    d = x - x.mean()
    skew = (d**3).mean() / (d**2).mean() ** 1.5
    kurt = (d**4).mean() / (d**2).mean() ** 2 - 3.0
    assert abs(r.skewness - skew) < 1e-4
    assert abs(r.excess_kurtosis - kurt) < 1e-4


def test_two_proportion_rates_and_symmetry(spark):
    """Rates in [0,1]; arms partition users; z is finite under the
    null-ish md5 split."""
    import math

    from kcore_spark.queries.extensions_r9o import q_two_proportion_z

    r = q_two_proportion_z(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.rate_0 <= 1.0 and 0.0 <= r.rate_1 <= 1.0
    assert r.n0 > 0 and r.n1 > 0
    if r.z_stat is None:
        # pooled variance 0: every user (or none) converted — the
        # NULLIF guard fires; legitimate at tiny fixtures
        assert r.rate_0 == r.rate_1 and r.rate_0 in (0.0, 1.0)
    else:
        assert math.isfinite(r.z_stat)


def test_runs_count_bounds(spark):
    """1 <= R <= n, and R can't exceed 2·min(n1,n0)+1."""
    from kcore_spark.queries.extensions_r9o import q_runs_test

    r = q_runs_test(spark, SF_DIR).collect()[0]
    assert 1 <= r.n_runs <= r.n_days
    assert r.expected_runs >= 1.0


def test_durbin_watson_in_range(spark):
    """DW lies in [0, 4] by construction."""
    from kcore_spark.queries.extensions_r9o import q_durbin_watson

    r = q_durbin_watson(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.durbin_watson <= 4.0
    assert r.n_days > 2

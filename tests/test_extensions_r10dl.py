"""Round-10 cointegration block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_engle_granger(spark):
    from kcore_spark.queries.extensions_r10dl import q_engle_granger

    r = q_engle_granger(spark, SF_DIR).collect()[0]
    assert r.n_months > 10
    # the DF gamma on a mean-reverting residual is negative
    assert -2.5 < r.df_gamma < 0.5
    assert math.isfinite(r.df_t)
    assert r.cointegrated_5pct == (r.df_t < -3.34)


def test_ecm(spark):
    from kcore_spark.queries.extensions_r10dl import q_error_correction

    r = q_error_correction(spark, SF_DIR).collect()[0]
    assert math.isfinite(r.short_run_dx)
    assert math.isfinite(r.adjustment_speed)
    assert r.error_correcting == (r.adjustment_speed < 0)


def test_var1(spark):
    from kcore_spark.queries.extensions_r10dl import q_var1_fit

    r = q_var1_fit(spark, SF_DIR).collect()[0]
    assert r.spectral_radius >= 0
    for c in (r.a_yy, r.a_yx, r.a_xy, r.a_xx):
        assert math.isfinite(c)
    assert r.stable == (r.spectral_radius < 1.0)

"""Round-10 meta-analysis block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_fixed_effect_ci(spark):
    from kcore_spark.queries.extensions_r10cn import q_meta_fixed_effect

    r = q_meta_fixed_effect(spark, SF_DIR).collect()[0]
    assert r.n_studies >= 5  # sf0.001 has few nations with both arms
    assert r.ci_lo <= r.pooled_effect <= r.ci_hi
    assert r.se > 0
    assert 0.0 <= r.p_value <= 1.0


def test_random_effects(spark):
    from kcore_spark.queries.extensions_r10cn import (
        q_meta_fixed_effect,
        q_meta_random_effects,
    )

    fe = q_meta_fixed_effect(spark, SF_DIR).collect()[0]
    re = q_meta_random_effects(spark, SF_DIR).collect()[0]
    assert re.q_cochran >= 0
    assert re.tau2 >= 0
    assert 0.0 <= re.i2 <= 1.0
    # RE standard error is at least the FE one
    assert re.se_re >= fe.se - 1e-9


def test_egger_finite(spark):
    from kcore_spark.queries.extensions_r10cn import q_egger_regression

    r = q_egger_regression(spark, SF_DIR).collect()[0]
    assert math.isfinite(r.egger_intercept)
    assert math.isfinite(r.precision_slope)

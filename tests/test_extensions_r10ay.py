"""Round-10 tail-modeling block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_hill_positive(spark):
    """Tail index positive; top-200 threshold below the maximum."""
    from kcore_spark.queries.extensions_r10ay import q_hill_estimator

    r = q_hill_estimator(spark, SF_DIR).collect()[0]
    assert r.k == 200
    assert r.x_k > 0
    assert r.hill_alpha > 0


def test_gpd_moments(spark):
    """Bounded-support exceedances give xi < 1/2 by MOM construction;
    scale positive."""
    from kcore_spark.queries.extensions_r10ay import q_pot_gpd_fit

    r = q_pot_gpd_fit(spark, SF_DIR).collect()[0]
    assert r.n_exceed > 20
    assert r.gpd_sigma > 0
    assert r.gpd_xi < 0.5


def test_weibull_shape(spark):
    """Shape and scale positive; scale within the duration range."""
    from kcore_spark.queries.extensions_r10ay import q_weibull_fit

    r = q_weibull_fit(spark, SF_DIR).collect()[0]
    assert r.n_points > 20
    assert r.weibull_k > 0
    assert 1 < r.weibull_lambda < 10000

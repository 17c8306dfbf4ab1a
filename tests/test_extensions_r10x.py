"""Round-10 modern two-sample-test block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_wasserstein_nonnegative(spark):
    from kcore_spark.queries.extensions_r10x import q_wasserstein_1d

    r = q_wasserstein_1d(spark, SF_DIR).collect()[0]
    assert r.n_click > 0 and r.n_purchase > 0
    assert r.wasserstein_1 >= 0
    assert r.n_steps > 0


def test_energy_distance_nonnegative(spark):
    """2*E|X-Y| - E|X-X'| - E|Y-Y'| >= 0 for real distributions."""
    from kcore_spark.queries.extensions_r10x import q_energy_distance

    r = q_energy_distance(spark, SF_DIR).collect()[0]
    assert r.mean_cross_dist > 0
    assert r.energy_distance >= -1e-9


def test_mmd_nonnegative_biased(spark):
    """The biased MMD^2 estimator (with diagonal terms) is >= 0."""
    from kcore_spark.queries.extensions_r10x import q_mmd_rbf

    r = q_mmd_rbf(spark, SF_DIR).collect()[0]
    assert 0 < r.mean_cross_kernel <= 1
    assert r.mmd2_rbf >= -1e-9

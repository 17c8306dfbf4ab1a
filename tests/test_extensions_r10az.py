"""Round-10 embedding-hygiene II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_embedding_drift_null_split(spark):
    """Hash halves of one corpus: tiny centroid shift, norm ratio ~1."""
    from kcore_spark.queries.extensions_r10az import q_embedding_drift

    r = q_embedding_drift(spark, SF_DIR).collect()[0]
    assert r.n0 > 10 and r.n1 > 10
    assert r.centroid_shift >= 0
    assert 0.8 < r.norm_ratio < 1.25


def test_intrinsic_dim_sane(spark):
    """Estimated dimension positive and below the ambient dimension
    by a wide margin is NOT guaranteed — just positive and finite."""
    from kcore_spark.queries.extensions_r10az import q_two_nn_intrinsic_dim

    r = q_two_nn_intrinsic_dim(spark, SF_DIR).collect()[0]
    assert r.m > 10
    assert 0 < r.intrinsic_dim < 1000


def test_isotropy_bounds(spark):
    """Anisotropy in [0,1); mean cosine to centroid in [-1,1]."""
    from kcore_spark.queries.extensions_r10az import q_isotropy_audit

    r = q_isotropy_audit(spark, SF_DIR).collect()[0]
    assert r.n > 10
    assert 0 <= r.anisotropy < 1
    assert -1 <= r.mean_cosine_to_mean <= 1

"""Round-10 embedding-hygiene block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_norm_audit_bounds(spark):
    from kcore_spark.queries.extensions_r10i import q_embedding_norm_audit

    rows = q_embedding_norm_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_norm <= r.avg_norm <= r.max_norm
        assert 0 <= r.n_zero <= r.n_vectors
        assert 0 <= r.n_off_unit <= r.n_vectors


def test_knn_consistency_rate(spark):
    from kcore_spark.queries.extensions_r10i import q_knn_label_consistency

    r = q_knn_label_consistency(spark, SF_DIR).collect()[0]
    assert r.n_anchors > 0
    assert 0 <= r.n_consistent <= r.n_anchors
    assert abs(r.consistency_rate - r.n_consistent / r.n_anchors) < 1e-4


def test_dimension_variance_descending(spark):
    from kcore_spark.queries.extensions_r10i import q_dimension_variance

    rows = q_dimension_variance(spark, SF_DIR).collect()
    assert len(rows) == 5
    vs = [r.variance for r in rows]
    assert vs == sorted(vs, reverse=True)
    for r in rows:
        assert r.variance >= 0
        assert 0 <= r.dim < 64

"""Round-10 embedding linear-algebra block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_dim_correlation_bounds(spark):
    from kcore_spark.queries.extensions_r10w import q_dim_correlation_pairs

    rows = q_dim_correlation_pairs(spark, SF_DIR).collect()
    assert len(rows) == 5
    rs = [abs(r.pearson_r) for r in rows]
    assert rs == sorted(rs, reverse=True)
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0
        assert 0 <= r.dim_i < r.dim_j < 16


def test_label_confusability_bounds(spark):
    from kcore_spark.queries.extensions_r10w import q_label_confusability

    rows = q_label_confusability(spark, SF_DIR).collect()
    assert len(rows) == 5
    sims = [r.centroid_cosine for r in rows]
    assert sims == sorted(sims, reverse=True)
    for r in rows:
        assert -1.0 <= r.centroid_cosine <= 1.0
        assert r.label_a < r.label_b

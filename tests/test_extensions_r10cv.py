"""Round-10 embedding-metric-geometry block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_metric_rank_agreement(spark):
    from kcore_spark.queries.extensions_r10cv import q_metric_rank_agreement

    r = q_metric_rank_agreement(spark, SF_DIR).collect()[0]
    assert 0 <= r.overlap <= 20
    assert r.same_position <= r.overlap
    assert 0.0 <= r.overlap_at_k <= 1.0


def test_norm_rank_bias(spark):
    from kcore_spark.queries.extensions_r10cv import q_norm_rank_bias

    r = q_norm_rank_bias(spark, SF_DIR).collect()[0]
    assert r.n > 50
    assert -1.0 <= r.spearman_norm_dot <= 1.0


def test_centering_effect(spark):
    from kcore_spark.queries.extensions_r10cv import q_centering_effect

    r = q_centering_effect(spark, SF_DIR).collect()[0]
    assert 0 <= r.overlap <= 20
    assert 0.0 <= r.overlap_at_k <= 1.0

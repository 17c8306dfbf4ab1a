"""Round-10 approximate-query-processing block invariants."""

from __future__ import annotations

from .conftest import SF_DIR_MED


def test_groupby_error(spark):
    from kcore_spark.queries.extensions_r10do import q_sample_groupby_error

    rows = q_sample_groupby_error(spark, SF_DIR_MED).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.est_n % 10 == 0
        # 10% sampling of thousands of rows stays within 25% per group
        assert r.rel_error < 0.25


def test_quantile_error(spark):
    from kcore_spark.queries.extensions_r10do import q_sample_quantile_error

    r = q_sample_quantile_error(spark, SF_DIR_MED).collect()[0]
    assert r.p50_exact > 0 and r.p90_exact > r.p50_exact
    assert r.p50_rel_error < 0.2
    assert r.p90_rel_error < 0.2


def test_topk_overlap(spark):
    from kcore_spark.queries.extensions_r10do import q_sample_topk_overlap

    r = q_sample_topk_overlap(spark, SF_DIR_MED).collect()[0]
    assert 0 <= r.overlap <= 10
    assert r.overlap_at_10 == r.overlap / 10

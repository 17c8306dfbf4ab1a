"""Round-10 retrieval-evaluation II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_rbo_bounds(spark):
    """RBO in [0,1]; shared relevance lift keeps lists overlapping."""
    from kcore_spark.queries.extensions_r10bn import q_rbo_lists

    r = q_rbo_lists(spark, SF_DIR).collect()[0]
    assert 0 < r.overlap_k <= 20
    assert 0 < r.rbo < 1


def test_err_bounds(spark):
    """ERR in (0,1]; 20-deep list."""
    from kcore_spark.queries.extensions_r10bn import q_err_metric

    r = q_err_metric(spark, SF_DIR).collect()[0]
    assert r.k == 20
    assert 0 < r.err <= 1


def test_overlap_accounting(spark):
    """in_both + only_a = 20 (and same for b); Jaccard consistent."""
    from kcore_spark.queries.extensions_r10bn import q_retriever_overlap

    r = q_retriever_overlap(spark, SF_DIR).collect()[0]
    assert r.in_both + r.only_a == 20
    assert r.in_both + r.only_b == 20
    union = r.in_both + r.only_a + r.only_b
    assert abs(r.jaccard_at_k - r.in_both / union) < 1e-5

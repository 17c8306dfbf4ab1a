"""Round-10 retrieval-evaluation block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_mrr_bounds(spark):
    from kcore_spark.queries.extensions_r10l import q_mrr_label

    r = q_mrr_label(spark, SF_DIR).collect()[0]
    assert r.n_anchors > 0
    assert 0 <= r.n_with_hit <= r.n_anchors
    assert 0 <= r.mrr_at_10 <= 1


def test_recall_curve_monotone(spark):
    """recall@k is non-decreasing in k; recall@10 agrees with MRR's
    hit count (same anchors, same top-10)."""
    from kcore_spark.queries.extensions_r10l import q_mrr_label, q_recall_at_k

    rows = q_recall_at_k(spark, SF_DIR).collect()
    assert [r.k for r in rows] == [1, 5, 10]
    recalls = [r.recall_at_k for r in rows]
    assert recalls == sorted(recalls)
    mrr = q_mrr_label(spark, SF_DIR).collect()[0]
    assert rows[-1].n_with_hit == mrr.n_with_hit


def test_diversity_bounds(spark):
    from kcore_spark.queries.extensions_r10l import q_retrieval_diversity

    r = q_retrieval_diversity(spark, SF_DIR).collect()[0]
    assert 1 <= r.min_labels <= r.avg_labels_per_list <= r.max_labels <= 10
    assert 0 < r.catalog_coverage <= 1

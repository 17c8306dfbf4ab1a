"""Round-10 clustering-comparison block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_nmi_bounds(spark):
    """MI >= 0; NMI in [0,1]; entropies positive."""
    from kcore_spark.queries.extensions_r10aq import q_nmi_labels

    r = q_nmi_labels(spark, SF_DIR).collect()[0]
    assert r.h_labels > 0 and r.h_buckets > 0
    assert r.mutual_info >= -1e-9
    assert 0 <= r.nmi <= 1


def test_fowlkes_mallows_bounds(spark):
    """FM in (0,1]; TP pairs bounded by both margins."""
    from kcore_spark.queries.extensions_r10aq import q_fowlkes_mallows

    r = q_fowlkes_mallows(spark, SF_DIR).collect()[0]
    assert 0 < r.tp_pairs <= min(r.label_pairs, r.bucket_pairs)
    assert 0 < r.fowlkes_mallows <= 1


def test_purity_bounds(spark):
    """4 buckets; purity per bucket in (1/k, 1]."""
    from kcore_spark.queries.extensions_r10aq import q_cluster_purity

    rows = q_cluster_purity(spark, SF_DIR).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_majority <= r.n_bucket
        assert 0 < r.bucket_purity <= 1

"""Round-10 graph-analytics block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_local_clustering_in_unit_interval(spark):
    from kcore_spark.queries.extensions_r10e import q_local_clustering

    rows = q_local_clustering(spark, SF_DIR).collect()
    assert rows
    coefs = [r.clustering_coef for r in rows]
    assert coefs == sorted(coefs, reverse=True)
    for r in rows:
        assert r.degree >= 4
        assert 0 <= r.clustering_coef <= 1
        # triangles at v bounded by C(deg, 2)
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_edge_embeddedness_bounds(spark):
    from kcore_spark.queries.extensions_r10e import q_edge_embeddedness

    rows = q_edge_embeddedness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.pa < r.pb
        assert 0 <= r.jaccard <= 1


def test_rich_club_monotone_node_counts(spark):
    """Higher threshold => fewer nodes; phi in [0, 1]."""
    from kcore_spark.queries.extensions_r10e import q_rich_club

    rows = q_rich_club(spark, SF_DIR).collect()
    assert [r.k for r in rows] == [2, 4, 8]
    ns = [r.n_nodes for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert 0 <= r.phi <= 1
        assert r.n_edges_within <= r.n_nodes * (r.n_nodes - 1) // 2

"""Round-10 clustering-validity block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_davies_bouldin_components(spark):
    """One row per label; scatter and DB components positive."""
    from kcore_spark.queries.extensions_r10af import q_davies_bouldin

    rows = q_davies_bouldin(spark, SF_DIR).collect()
    assert len(rows) >= 2
    labels = [r.label for r in rows]
    assert labels == sorted(labels)
    for r in rows:
        assert r.n_vecs > 0
        assert r.scatter > 0
        # R_ij >= scatter ratio floor: component at least as large as
        # the label's own scatter share of the closest pair
        assert r.db_component > 0


def test_calinski_harabasz_positive(spark):
    """CH index positive; SS decomposition consistent (B,W > 0, n > k)."""
    from kcore_spark.queries.extensions_r10af import q_calinski_harabasz

    r = q_calinski_harabasz(spark, SF_DIR).collect()[0]
    assert r.n > r.k >= 2
    assert r.between_ss > 0 and r.within_ss > 0
    assert r.ch_index > 0


def test_adjusted_rand_range(spark):
    """ARI in [-1, 1]; independent-ish labelings stay well below 1."""
    from kcore_spark.queries.extensions_r10af import q_adjusted_rand

    r = q_adjusted_rand(spark, SF_DIR).collect()[0]
    assert r.n > 0 and r.k1 >= 2 and r.k2 >= 2
    assert -1.0 <= r.ari <= 1.0
    # the bucket labeling is derived from one dimension only — perfect
    # agreement with the fixture labels would be a fixture bug
    assert r.ari < 0.999

"""Round-10 evaluation-decomposition block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_brier_decomposition_identity(spark):
    """REL >= 0, RES >= 0, UNC in [0, 0.25]; recomposition equals
    REL - RES + UNC."""
    from kcore_spark.queries.extensions_r10ab import q_brier_decomposition

    r = q_brier_decomposition(spark, SF_DIR).collect()[0]
    assert r.reliability >= 0
    assert r.resolution >= 0
    assert 0 <= r.uncertainty <= 0.25
    assert abs(
        r.brier_recomposed - (r.reliability - r.resolution + r.uncertainty)
    ) < 1e-5


def test_topk_stability_bounds(spark):
    from kcore_spark.queries.extensions_r10ab import q_topk_stability

    r = q_topk_stability(spark, SF_DIR).collect()[0]
    assert 0 <= r.n_common <= 20
    assert r.n_union == 2 * 20 - r.n_common
    assert 0 <= r.jaccard <= 1

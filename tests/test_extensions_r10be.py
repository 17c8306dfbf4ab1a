"""Round-10 graph II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_jaccard_lp_bounds(spark):
    """Jaccard in (0,1]; descending; common <= implied min degree."""
    from kcore_spark.queries.extensions_r10be import q_jaccard_link_prediction

    rows = q_jaccard_link_prediction(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20
    js = [r.jaccard for r in rows]
    assert js == sorted(js, reverse=True)
    for r in rows:
        assert 0 < r.jaccard <= 1
        assert r.common_parts >= 2
        assert r.pref_attach >= r.common_parts


def test_powerlaw_alpha_range(spark):
    """alpha > 1 by construction of the MLE."""
    from kcore_spark.queries.extensions_r10be import q_powerlaw_fit

    r = q_powerlaw_fit(spark, SF_DIR).collect()[0]
    assert r.n_tail >= 10
    assert r.powerlaw_alpha > 1


def test_degree_ccdf_monotone(spark):
    """CCDF non-increasing in k; starts at 1 for k=1 (degrees >= 1)."""
    from kcore_spark.queries.extensions_r10be import q_degree_ccdf

    rows = q_degree_ccdf(spark, SF_DIR).collect()
    assert [r.min_degree for r in rows] == [1, 2, 4, 8, 16, 32, 64]
    cc = [r.ccdf for r in rows]
    assert cc[0] == 1.0
    assert all(a >= b for a, b in zip(cc, cc[1:]))

"""Round-10 rank-fusion-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_borda_bounds(spark):
    from kcore_spark.queries.extensions_r10ch import q_borda_fusion

    rows = q_borda_fusion(spark, SF_DIR).collect()
    assert rows
    pts = [r.borda_points for r in rows]
    assert pts == sorted(pts, reverse=True)
    for r in rows:
        assert 0 <= r.borda_points <= 3 * 20
        for rank in (r.r_revenue, r.r_breadth, r.r_volume):
            assert 1 <= rank <= 21


def test_condorcet_bounds(spark):
    from kcore_spark.queries.extensions_r10ch import q_condorcet_fusion

    rows = q_condorcet_fusion(spark, SF_DIR).collect()
    assert rows
    cs = [r.copeland for r in rows]
    assert cs == sorted(cs, reverse=True)
    assert all(c >= 0 for c in cs)


def test_bpref_range(spark):
    from kcore_spark.queries.extensions_r10ch import q_bpref

    rows = q_bpref(spark, SF_DIR).collect()
    if rows:  # needs >=1 relevant in the shortlist
        r = rows[0]
        assert 0.0 <= r.bpref <= 1.0
        assert r.n_relevant + r.n_nonrelevant == 20

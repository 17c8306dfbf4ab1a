"""Round-10 causal II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_uplift_null_split(spark):
    """Pinned A/A split: uplift small in every segment."""
    from kcore_spark.queries.extensions_r10bm import q_uplift_by_segment

    rows = q_uplift_by_segment(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_treated > 0 and r.n_control > 0
        assert 0 <= r.p_treated <= 1 and 0 <= r.p_control <= 1
        assert abs(r.uplift) < 0.35


def test_mediation_identity(spark):
    """OLS identity: total = direct + indirect (up to rounding)."""
    from kcore_spark.queries.extensions_r10bm import q_mediation_paths

    r = q_mediation_paths(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    assert abs(r.total_effect - (r.direct_effect + r.indirect_effect)) < 1e-3
    assert r.path_a > 0  # more lines -> more total quantity


def test_dose_response_bands(spark):
    """5 bands, each populated; return rates bounded."""
    from kcore_spark.queries.extensions_r10bm import q_dose_response

    rows = q_dose_response(spark, SF_DIR).collect()
    assert [r.discount_band for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert r.n > 0
        assert 0 <= r.return_rate <= 1
        assert r.avg_qty > 0

"""Round-10 index-numbers/curation-reporting block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_price_index_sandwich(spark):
    """Fisher lies between Laspeyres and Paasche (geometric mean)."""
    from kcore_spark.queries.extensions_r10bk import q_price_index

    r = q_price_index(spark, SF_DIR).collect()[0]
    assert r.n_parts > 10
    lo, hi = sorted([r.laspeyres, r.paasche])
    assert lo - 1e-9 <= r.fisher <= hi + 1e-9
    assert 0.1 < r.fisher < 10


def test_cohort_payback_rows(spark):
    """Every cohort row present; payback (when reached) non-negative."""
    from kcore_spark.queries.extensions_r10bk import q_cohort_payback

    rows = q_cohort_payback(spark, SF_DIR).collect()
    assert len(rows) > 10
    for r in rows:
        assert r.n_customers > 0
        if r.payback_months is not None:
            assert r.payback_months >= 0


def test_dedup_impact_consistent(spark):
    """after <= before on both axes; reduction ratio consistent."""
    from kcore_spark.queries.extensions_r10bk import q_dedup_impact_report

    r = q_dedup_impact_report(spark, SF_DIR).collect()[0]
    assert 0 < r.docs_after <= r.docs_before
    assert 0 < r.tokens_after <= r.tokens_before
    assert abs(
        r.token_reduction - (1 - r.tokens_after / r.tokens_before)
    ) < 1e-5

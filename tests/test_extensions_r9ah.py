"""Cohort-LTV invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_cohort_ltv_shape(spark):
    """Ages within 0..2; cohort sizes positive; per-customer spend
    positive; cohort sizes consistent across that cohort's age rows."""
    from kcore_spark.queries.extensions_r9ah import q_cohort_ltv

    rows = q_cohort_ltv(spark, SF_DIR).collect()
    assert rows
    sizes: dict[str, int] = {}
    for r in rows:
        assert 0 <= r.age_quarters <= 2
        assert r.cohort_size > 0
        assert r.spend_per_customer > 0
        assert sizes.setdefault(r.cohort, r.cohort_size) == r.cohort_size

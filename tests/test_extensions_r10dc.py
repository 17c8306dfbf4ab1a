"""Round-10 filter-operations block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_filter_kappa(spark):
    from kcore_spark.queries.extensions_r10dc import q_filter_agreement_kappa

    rows = q_filter_agreement_kappa(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r.raw_agreement <= 1.0
        assert -1.0 <= r.kappa <= 1.0


def test_filter_venn(spark):
    from kcore_spark.queries.extensions_r10dc import q_filter_venn

    rows = q_filter_venn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 8
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4


def test_filter_marginal(spark):
    from kcore_spark.queries.extensions_r10dc import q_filter_marginal_value

    rows = q_filter_marginal_value(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.unique_removed <= r.total_removed
        assert 0.0 <= r.redundancy_share <= 1.0

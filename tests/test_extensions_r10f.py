"""Round-10 product-analytics block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_l28_shares_sum_to_one(spark):
    from kcore_spark.queries.extensions_r10f import q_l28_engagement

    rows = q_l28_engagement(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.user_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.total_active_days >= r.n_users  # each user >= 1 active day


def test_rfm_migration_is_full_matrix_partition(spark):
    """Cells partition the customer base (every customer has exactly
    one (h1, h2) segment pair)."""
    from kcore_spark.queries.extensions_r10f import q_rfm_migration

    rows = q_rfm_migration(spark, SF_DIR).collect()
    segs = {"0_none", "1_low", "2_high"}
    for r in rows:
        assert r.seg_h1 in segs and r.seg_h2 in segs
        assert r.n_customers > 0
    # no (none, none) cell: every customer in orders placed >= 1 order
    assert ("0_none", "0_none") not in {(r.seg_h1, r.seg_h2) for r in rows}


def test_purchase_gap_percentiles_ordered(spark):
    from kcore_spark.queries.extensions_r10f import q_repeat_purchase_gap

    rows = q_repeat_purchase_gap(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.p25_gap <= r.median_gap <= r.p75_gap


def test_new_vs_returning_tail(spark):
    from kcore_spark.queries.extensions_r10f import q_new_vs_returning

    rows = q_new_vs_returning(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    days = [r.day for r in rows]
    assert days == sorted(days)
    for r in rows:
        assert 0 <= r.returning_share <= 1

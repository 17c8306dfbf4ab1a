"""Round-10 auction-analytics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_second_price(spark):
    from kcore_spark.queries.extensions_r10de import q_second_price_revenue

    r = q_second_price_revenue(spark, SF_DIR).collect()[0]
    assert r.n_auctions > 0
    # second price never beats first price
    assert r.second_price_revenue <= r.first_price_revenue
    assert 0.0 < r.vickrey_discount <= 1.0


def test_reserve_sweep_monotone(spark):
    from kcore_spark.queries.extensions_r10de import q_reserve_price_sweep

    rows = q_reserve_price_sweep(spark, SF_DIR).collect()
    assert rows
    sold = [r.n_sold for r in rows]
    assert sold == sorted(sold, reverse=True)  # higher reserve, fewer sales
    for r in rows:
        assert 0.0 <= r.sell_through <= 1.0


def test_revenue_equivalence(spark):
    from kcore_spark.queries.extensions_r10de import q_revenue_equivalence_check

    rows = q_revenue_equivalence_check(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 2 <= r.n_bids <= 6
        assert 0.0 < r.empirical_ratio <= 1.0
        assert abs(
            r.uniform_theory_ratio - (r.n_bids - 1) / (r.n_bids + 1)
        ) < 1e-6

"""Round-10 commerce-analytics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_wilson_interval_brackets_rate(spark):
    from kcore_spark.queries.extensions_r10j import q_return_rate_wilson

    rows = q_return_rate_wilson(spark, SF_DIR).collect()
    assert len(rows) == 10
    lcbs = [r.wilson_lcb for r in rows]
    assert lcbs == sorted(lcbs, reverse=True)
    for r in rows:
        assert 0 <= r.wilson_lcb <= r.return_rate <= r.wilson_ucb <= 1
        assert r.n_returned <= r.n_items


def test_discount_response_levels(spark):
    from kcore_spark.queries.extensions_r10j import q_discount_response

    r = q_discount_response(spark, SF_DIR).collect()[0]
    assert r.n_levels >= 5
    assert r.intercept_qty > 0


def test_unit_price_dispersion_positive(spark):
    from kcore_spark.queries.extensions_r10j import q_unit_price_dispersion

    rows = q_unit_price_dispersion(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cv > 0
        assert r.mean_unit_price > 0


def test_seasonality_index_averages_to_one(spark):
    from kcore_spark.queries.extensions_r10j import q_ship_month_seasonality

    rows = q_ship_month_seasonality(spark, SF_DIR).collect()
    assert len(rows) == 12
    assert abs(sum(r.seasonality_index for r in rows) / 12 - 1.0) < 1e-4

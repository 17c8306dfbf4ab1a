"""Round-10 trade-flow block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_trade_balance_nets_to_zero(spark):
    """Every cent attributed to a buyer nation is attributed to a
    seller nation, so the global net balance is exactly zero."""
    from kcore_spark.queries.extensions_r10m import q_nation_trade_balance

    rows = q_nation_trade_balance(spark, SF_DIR).collect()
    assert len(rows) == 25
    assert abs(sum(r.net_balance for r in rows)) < 0.01
    assert abs(
        sum(r.demand_revenue for r in rows) - sum(r.supply_revenue for r in rows)
    ) < 0.01


def test_spof_shares_bounded(spark):
    from kcore_spark.queries.extensions_r10m import q_supplier_spof

    rows = q_supplier_spof(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.top1_share <= 1
        assert r.spof_flag == (r.top1_share > 0.4)


def test_flow_matrix_shares_sum_to_one(spark):
    from kcore_spark.queries.extensions_r10m import q_region_flow_matrix

    rows = q_region_flow_matrix(spark, SF_DIR).collect()
    assert len(rows) == 25  # 5x5 regions, fixture is dense
    assert abs(sum(r.flow_share for r in rows) - 1.0) < 1e-4

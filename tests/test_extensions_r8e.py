"""Round-8e extension operators: target-encoding leakage exclusion on
a hand-computable segment, and a flat Lorenz curve for equal spends."""

from __future__ import annotations

import datetime

import pytest


ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)


def test_target_encoding_excludes_own_label(spark, tmp_path):
    """One segment, labels [1,0,0]: the active customer's LOO is
    (1-1)/2 = 0; the inactive ones get (1-0)/2 = 0.5 — own label
    never leaks into its own feature."""
    from kcore_spark.queries.extensions_r8e import q_target_encoding

    cust = [(c, f"c{c}", 0, 0.0, "SEG") for c in (1, 2, 3)]
    orders = []
    k = 0
    for _ in range(12):  # customer 1 is active (>= 10 orders)
        orders.append((k, 1, "F", 10.0, datetime.datetime(2024, 1, 1), "x"))
        k += 1
    orders.append((k, 2, "F", 10.0, datetime.datetime(2024, 1, 1), "x"))
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r["c_custkey"]: r for r in q_target_encoding(spark, str(tmp_path)).collect()}
    assert out[1]["y"] == 1 and out[1]["te_loo"] == 0.0
    assert out[2]["y"] == 0 and out[2]["te_loo"] == 0.5
    assert out[3]["y"] == 0 and out[3]["te_loo"] == 0.5
    # smoothed: (1 + 10*(1/3)) / (3 + 10), same for every row
    assert out[1]["te_smooth"] == pytest.approx((1 + 10 * (1 / 3)) / 13, abs=1e-8)


def test_lorenz_flat_for_equal_spend(spark, tmp_path):
    """20 customers spending identically: every decile holds 10% of
    revenue and the curve is the diagonal."""
    from kcore_spark.queries.extensions_r8e import q_lorenz_curve

    orders = [
        (k, 1 + k % 20, "F", 50.0, datetime.datetime(2024, 1, 1), "x")
        for k in range(40)
    ]
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = q_lorenz_curve(spark, str(tmp_path)).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    for i, r in enumerate(out, start=1):
        assert r["n_cust"] == 2
        assert r["share"] == pytest.approx(0.1, abs=1e-9)
        assert r["cum_share"] == pytest.approx(i / 10, abs=1e-9)

"""Round-10 reconciliation/lifecycle block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_reconciliation_covers_all_orders(spark):
    from pyspark.sql import functions as F

    from kcore_spark.catalog import load_table
    from kcore_spark.queries.extensions_r10aa import q_order_total_reconciliation

    rows = q_order_total_reconciliation(spark, SF_DIR).collect()
    total = sum(r.n_orders for r in rows)
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert total == n_orders


def test_fanout_histogram_totals(spark):
    from kcore_spark.catalog import load_table
    from kcore_spark.queries.extensions_r10aa import q_fanout_histogram

    rows = q_fanout_histogram(spark, SF_DIR).collect()
    li_total = sum(r.fanout * r.n_keys for r in rows if r.relation == "lineitems_per_order")
    assert li_total == load_table(spark, SF_DIR, "lineitem").count()
    oc_total = sum(r.fanout * r.n_keys for r in rows if r.relation == "orders_per_customer")
    assert oc_total == load_table(spark, SF_DIR, "orders").count()


def test_reactivation_rate_bounds(spark):
    from kcore_spark.queries.extensions_r10aa import q_reactivation_rate

    rows = q_reactivation_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_reactivations <= r.n_active_users
        assert 0 <= r.reactivation_rate <= 1

"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (driver runs sf0.01; tests
use sf0.001 to stay fast — scale-independent logic either matches at
both or neither)."""

from __future__ import annotations

import pytest

from kcore_spark.queries import all_queries
from kcore_spark.testing import compare

from .conftest import SF_DIR

QS = all_queries()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_matches_oracle(name, spark, duck):
    spec = QS[name]
    df = spec.spark(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert df.count() >= 0
        assert df.columns
        return
    res = compare(name, df, spec.oracle, duck)
    assert res.ok, res.diff_summary()


def test_native_recursive_cte_matches_closed_form(spark):
    """Pins Spark's native WITH RECURSIVE executor AND verifies the
    closed-form rewrite that the registry entry uses (linear recursion
    over a functional edge list ⇒ row_number)."""
    from kcore_spark.queries.recursive import (
        q_recursive_order_chains,
        q_recursive_order_chains_native,
    )

    fast = {
        (r.depth, r.n_customers_at_depth)
        for r in q_recursive_order_chains(spark, SF_DIR).collect()
    }
    native = {
        (r.depth, r.n_customers_at_depth)
        for r in q_recursive_order_chains_native(spark, SF_DIR).collect()
    }
    assert fast == native and fast

"""Structural invariants of the round-9 batch-T BI rows (YoY growth,
raking, MA crossover)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_yoy_first_rows_null_then_filled(spark):
    """The first month has no MoM; the first 12 have no YoY; revenue
    is positive everywhere."""
    from kcore_spark.queries.extensions_r9t import q_yoy_growth

    rows = q_yoy_growth(spark, SF_DIR).collect()
    assert len(rows) >= 13
    assert rows[0].mom_pct is None and rows[0].yoy_pct is None
    assert all(r.yoy_pct is None for r in rows[:12])
    assert rows[12].yoy_pct is not None
    assert all(r.revenue > 0 for r in rows)


def test_raking_hits_margins(spark):
    """After three rounds the column margins are matched EXACTLY (the
    last scaling is a column pass) and row margins are close; weights
    stay positive."""
    import duckdb

    from kcore_spark.queries.extensions_r9t import q_raking_ipf

    rows = q_raking_ipf(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.raked_weight > 0
        assert abs(r.row_margin_gap) < 1.0  # near-converged rows
    col_t = dict(
        duckdb.sql(
            f"SELECT c_nationkey % 5, COUNT(*) FROM '{SF_DIR}/customer.parquet' "
            f"GROUP BY 1"
        ).fetchall()
    )
    by_ng: dict[int, float] = {}
    for r in rows:
        by_ng[r.ng] = by_ng.get(r.ng, 0.0) + r.raked_weight
    for ng, tot in by_ng.items():
        assert abs(tot - col_t[ng]) < 1e-3


def test_ma_crossover_alternates(spark):
    """Consecutive signals must alternate golden/death (a sign can
    only flip to the other sign)."""
    from kcore_spark.queries.extensions_r9t import q_ma_crossover

    rows = q_ma_crossover(spark, SF_DIR).collect()
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.signal != b.signal

"""Round-10 window-dialect block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_named_window(spark):
    from kcore_spark.queries.extensions_r10cr import q_named_window_clause

    rows = q_named_window_clause(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.rk >= 1
        assert r.run_cents > 0


def test_ignore_nulls_fill(spark):
    from kcore_spark.queries.extensions_r10cr import q_ignore_nulls_family

    rows = q_ignore_nulls_family(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # the fill carries the last non-null: equal to v whenever v set
        if r.v is not None:
            assert r.filled_v == r.v
        if r.first_nn is not None and r.v is not None:
            assert r.first_nn is not None


def test_frame_matrix(spark):
    from kcore_spark.queries.extensions_r10cr import q_frame_bounds_matrix

    rows = q_frame_bounds_matrix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.win5_n <= 5
        assert r.tail_sum >= r.cents  # tail includes the current row

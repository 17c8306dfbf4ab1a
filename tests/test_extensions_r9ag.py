"""TWAP and budgeted-selection invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_twap_differs_from_plain_mean_but_same_scale(spark):
    from kcore_spark.queries.extensions_r9ag import q_twap

    rows = q_twap(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_spans > 0
        # both are convex combinations of the same values
        assert 0 <= r.twap <= 200 and 0 <= r.plain_avg <= 200


def test_budget_respected_and_quality_sorted(spark):
    import duckdb

    from kcore_spark.queries.extensions_r9ag import (
        _SELECT_BUDGET,
        q_budgeted_selection,
    )

    r = q_budgeted_selection(spark, SF_DIR).collect()[0]
    assert r.n_selected > 0
    assert r.chars_used <= _SELECT_BUDGET
    # the selected set's mean quality must beat the corpus mean
    corpus = duckdb.sql(
        f"SELECT AVG(len(list_distinct(string_split(lower(text), ' '))) * 1.0 "
        f"/ len(string_split(lower(text), ' '))) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert r.avg_quality_selected >= corpus

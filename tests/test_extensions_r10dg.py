"""Round-10 aggregate-surface-III block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_predicate_family(spark):
    from kcore_spark.queries.extensions_r10dg import q_agg_predicate_family

    rows = q_agg_predicate_family(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_big >= 0
        assert r.biggest_order_key != r.smallest_order_key
        assert isinstance(r.all_over_1k, bool)
        assert isinstance(r.any_finished, bool)


def test_grouping_id(spark):
    from kcore_spark.queries.extensions_r10dg import q_grouping_id_rollup

    rows = q_grouping_id_rollup(spark, SF_DIR).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 3}  # detail, status subtotal, grand total
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    assert grand[0].n == sum(r.n for r in rows if r.gid == 0)


def test_mixed_distinct(spark):
    from kcore_spark.queries.extensions_r10dg import q_mixed_distinct_aggregates

    rows = q_mixed_distinct_aggregates(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.nd_pairs >= max(r.nd_parts, r.nd_supps)
        assert r.nd_pairs <= r.n_rows
        assert r.sum_distinct_q > 0

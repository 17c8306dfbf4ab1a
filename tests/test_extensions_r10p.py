"""Round-10 lambda-function surface block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_map_higher_order_bounds(spark):
    from kcore_spark.queries.extensions_r10p import q_map_higher_order

    rows = q_map_higher_order(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.entries_kept <= 3 * r.n_events
        assert r.kept_value_sum <= r.pairmax_value_sum


def test_array_set_algebra_partition(spark):
    """Stop hits + content size = distinct vocab per doc (summed)."""
    from kcore_spark.queries.extensions_r10p import q_array_set_algebra

    rows = q_array_set_algebra(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_docs_with_stopword <= r.n_docs
        assert r.n_docs_with_long_word <= r.n_docs
        assert r.stop_vocab_hits <= 6 * r.n_docs  # <= stopword list size


def test_struct_ordering_lexicographic(spark):
    from kcore_spark.queries.extensions_r10p import q_struct_ordering

    rows = q_struct_ordering(spark, SF_DIR).collect()
    assert len(rows) == 10
    keys = [(r.o_orderpriority, -r.totalprice, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)

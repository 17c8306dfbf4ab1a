"""Structural invariants of the round-9 batch-J surface rows
(collation, mergeSchema, _metadata provenance, stream-stream semi)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_collated_group_merges_cases(spark):
    """UTF8_LCASE grouping must merge the md5-flipped lowercase rows
    into their uppercase segment: 5 groups (one per segment), each
    canonical representative being the binary-min (uppercase) form."""
    from kcore_spark.queries.extensions_r9j import q_collated_group

    rows = q_collated_group(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.segment == r.segment.lower()
        assert r.canonical == r.canonical.upper()
        assert r.n > 0


def test_schema_merge_null_padding(spark):
    """v1 rows carry price only, v2 rows priority only — the merged
    scan must account for every row exactly once with disjoint
    non-null column populations."""
    from kcore_spark.queries.extensions_r9j import q_schema_merge_read

    r = q_schema_merge_read(spark, SF_DIR).collect()[0]
    assert r.n_rows == r.n_with_price + r.n_with_priority
    assert r.n_with_price > 0 and r.n_with_priority > 0
    assert r.custs_v2 > 0


def test_file_provenance_partition_of_orders(spark):
    """The three slices partition the orders table: counts sum to the
    table row count and each slice is non-empty."""
    import duckdb

    from kcore_spark.queries.extensions_r9j import q_file_provenance

    rows = q_file_provenance(spark, SF_DIR).collect()
    assert sorted(r.slice for r in rows) == ["high", "rest", "urgent"]
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.n_rows for r in rows) == total


def test_semi_join_never_amplifies(spark):
    """Semi-join output per user is bounded by that user's purchase
    count (existence, not enrichment) and is a subset of the inner
    join's matched purchases."""
    import duckdb

    from kcore_spark.queries.extensions_r9j import q_stream_stream_semi_join

    rows = q_stream_stream_semi_join(spark, SF_DIR).collect()
    purchases = dict(
        duckdb.sql(
            f"SELECT user_id, COUNT(*) FROM '{SF_DIR}/events.parquet' "
            f"WHERE event_type = 'purchase' GROUP BY user_id"
        ).fetchall()
    )
    for r in rows:
        assert 0 < r.n_preceded_purchases <= purchases[r.p_user]

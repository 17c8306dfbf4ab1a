"""Structural invariants of the round-9 batch-S streaming-semantics
rows (SCD2 validity join, deterministic late-data drop)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_scd2_join_covers_every_probed_event(spark):
    """Every stream event whose user has ANY dimension history and
    whose effective date falls at/after the first version resolves
    exactly one version — totals match the batch probe count."""
    import duckdb

    from kcore_spark.queries.extensions_r9s import q_stream_scd2_join

    rows = q_stream_scd2_join(spark, SF_DIR).collect()
    assert rows
    expected = duckdb.sql(
        f"""
        WITH first_ver AS (
          SELECT o_custkey AS custkey, MIN(CAST(o_orderdate AS DATE)) AS v0
          FROM '{SF_DIR}/orders.parquet' GROUP BY 1)
        SELECT COUNT(*) FROM '{SF_DIR}/events.parquet' e
        JOIN first_ver f ON e.user_id = f.custkey
        WHERE CAST('1995-01-01' AS DATE) + INTERVAL (e.event_id % 2400) DAY >= f.v0
        """
    ).fetchone()[0]
    assert sum(r.n_events for r in rows) == expected


def test_late_data_actually_dropped(spark):
    """The staged 2-triggers-late subset must be ABSENT from the
    emitted windows: kept total = all events − displaced − the tail
    windows the final watermark never closes, and displaced > 0 (the
    test dies if the staging stops producing genuinely late rows)."""
    import duckdb

    from kcore_spark.queries.extensions_r9s import q_stream_late_data_drop

    rows = q_stream_late_data_drop(spark, SF_DIR).collect()
    kept = sum(r.n for r in rows)
    stats = duckdb.sql(
        f"""
        WITH split AS (
          SELECT CAST(quantile_cont(epoch_us(CAST(ts AS TIMESTAMP)), 0.7) AS BIGINT) AS q,
                 MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS mx
          FROM '{SF_DIR}/events.parquet')
        SELECT COUNT(*) AS total,
               SUM(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) <= q - 7200000000
                         AND event_id % 37 = 0 THEN 1 ELSE 0 END) AS displaced
        FROM '{SF_DIR}/events.parquet' CROSS JOIN split
        """
    ).fetchone()
    total, displaced = stats
    assert displaced > 0
    assert kept < total - displaced + 1  # displaced gone (tail may drop more)

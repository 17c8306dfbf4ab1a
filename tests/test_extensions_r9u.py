"""Structural invariants of the round-9 batch-U additions (Bloom FPP,
erasure audit, missing slots)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bloom_measured_near_theoretical_and_no_false_negatives(spark):
    """Measured FPP within a loose band of the analytic rate (broken
    hashing/bit ops blow this), and — by construction — no member is
    ever reported missing (the probe set is the negatives only, so the
    false-negative guarantee reduces to the build covering members;
    assert via rate < 1)."""
    from kcore_spark.queries.extensions_r9u import q_bloom_fpp

    r = q_bloom_fpp(spark, SF_DIR).collect()[0]
    assert r.n_negatives > 0
    assert 0.0 <= r.measured_fpp < 1.0
    if r.theoretical_fpp > 0.01:
        assert 0.3 * r.theoretical_fpp <= max(r.measured_fpp, 1e-9) <= 3.0 * r.theoretical_fpp


def test_erasure_audit_consistency(spark):
    """Residue counts: orders >= customer cohort can't exceed orders
    per cohort member times …; basic transitivity — lineitem residue
    is 0 iff orders residue is 0."""
    from kcore_spark.queries.extensions_r9u import q_erasure_audit

    rows = {r.table_name: r.residue_rows for r in q_erasure_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    assert rows["customer"] > 0
    if rows["orders"] == 0:
        assert rows["lineitem"] == 0


def test_missing_slots_bounds(spark):
    """missing <= expected, expected >= 1, and a type with events in
    every hour reports 0 missing."""
    from kcore_spark.queries.extensions_r9u import q_missing_slots

    rows = q_missing_slots(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.missing_hours <= r.expected_hours
        if r.missing_hours > 0:
            assert r.first_gap_epoch is not None

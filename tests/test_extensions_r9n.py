"""Structural invariants of the round-9 batch-N additions (threshold
sweep, cross-source overlap, ECE)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_sweep_is_monotone_decreasing(spark):
    """Raising τ can only shrink the pair set and the affected-doc
    set; the grid covers all seven thresholds including empty tails."""
    from kcore_spark.queries.extensions_r9n import q_neardup_threshold_sweep

    rows = q_neardup_threshold_sweep(spark, SF_DIR).collect()
    assert len(rows) == 7
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_affected for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert pairs[0] > 0


def test_overlap_matrix_is_canonical_and_bounded(spark):
    """source_a <= source_b (canonical pairs) and the matrix total
    equals the τ=0.35 pair count restricted to doc-backed ids."""
    from kcore_spark.queries.extensions_r9n import (
        _blocked_pairs,
        q_cross_source_overlap,
    )

    rows = q_cross_source_overlap(spark, SF_DIR).collect()
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.n_neardup_pairs > 0
    total_pairs = _blocked_pairs(spark, SF_DIR, 0.35).count()
    assert sum(r.n_neardup_pairs for r in rows) <= total_pairs


def test_ece_bounded_and_consistent_with_brier_buckets(spark):
    """ECE lies in [0, 1] and uses the same bucket population as
    q_brier_calibration (shared scorer)."""
    from kcore_spark.queries.extensions_r8 import q_brier_calibration
    from kcore_spark.queries.extensions_r9n import q_ece

    r = q_ece(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.ece <= 1.0
    brier_rows = q_brier_calibration(spark, SF_DIR).collect()
    assert r.n == sum(b.n for b in brier_rows)

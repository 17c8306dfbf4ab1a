"""Round-10 winnowing-fingerprint block invariants."""

from __future__ import annotations

from .conftest import SF_DIR, SF_DIR_MED


def test_winnowing_density(spark):
    from kcore_spark.queries.extensions_r10cf import q_winnowing_fingerprints

    rows = q_winnowing_fingerprints(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        # winnowing guarantees at least one print per window and the
        # expected density is ~2/(w+1)=0.4 of grams; prints per doc
        # must be positive and far below the raw gram count
        assert r.avg_prints_per_doc > 0


def test_overlap_pairs_ordered(spark):
    from kcore_spark.queries.extensions_r10cf import q_fingerprint_overlap_pairs

    rows = q_fingerprint_overlap_pairs(spark, SF_DIR_MED).collect()
    shared = [r.shared for r in rows]
    assert shared == sorted(shared, reverse=True)
    for r in rows:
        assert r.shared >= 3
        assert r.da < r.db


def test_containment_bounds(spark):
    from kcore_spark.queries.extensions_r10cf import q_fingerprint_containment

    r = q_fingerprint_containment(spark, SF_DIR_MED).collect()[0]
    if r.n_pairs:
        assert 0.0 < r.avg_containment <= 1.0
        assert r.max_containment <= 1.0
        assert r.max_shared >= 3

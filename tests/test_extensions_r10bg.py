"""Round-10 process-mining block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_trace_variants(spark):
    """Top variants descending; depth bounded at 10."""
    from kcore_spark.queries.extensions_r10bg import q_trace_variants

    rows = q_trace_variants(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 10
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert 1 <= r.depth <= 10
        assert len(r.variant.split(">")) == r.depth


def test_conformance_bounds(spark):
    """Rate in [0,1]; average trace length positive."""
    from kcore_spark.queries.extensions_r10bg import q_happy_path_conformance

    r = q_happy_path_conformance(spark, SF_DIR).collect()[0]
    assert r.n_users >= 10
    assert 0 <= r.conformance_rate <= 1
    assert r.n_conform <= r.n_users
    assert r.avg_trace_len >= 1


def test_transition_durations(spark):
    """All 25 type pairs present at sf >= 0.001-ish; gaps positive."""
    from kcore_spark.queries.extensions_r10bg import q_transition_durations

    rows = q_transition_durations(spark, SF_DIR).collect()
    assert len(rows) >= 20
    for r in rows:
        assert r.n > 0
        assert r.mean_gap_s >= 0
        assert r.median_gap_s >= 0

"""Round-10 queueing-theory block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_erlang_staffing_meets_sl(spark):
    """Every stream gets the smallest agent count with SL >= 0.8."""
    from kcore_spark.queries.extensions_r10ar import q_erlang_c_staffing

    rows = q_erlang_c_staffing(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r.agents <= 10
        assert r.service_level >= 0.8
        assert 0 <= r.p_wait <= 1


def test_mm1_ordering(spark):
    """rho <= 0.9 everywhere (capacity pinned at busiest/0.9); waits
    increase with rho."""
    from kcore_spark.queries.extensions_r10ar import q_mm1_metrics

    rows = q_mm1_metrics(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert max(r.rho for r in rows) <= 0.9 + 1e-6
    by_rho = sorted(rows, key=lambda r: r.rho)
    wqs = [r.wq_seconds for r in by_rho]
    assert wqs == sorted(wqs)
    for r in rows:
        assert r.w_seconds > r.wq_seconds


def test_ladder_hockey_stick(spark):
    """Wait falls monotonically as headroom grows; the 1.05 point is
    dramatically worse than the 2.0 point."""
    from kcore_spark.queries.extensions_r10ar import q_utilization_ladder

    rows = q_utilization_ladder(spark, SF_DIR).collect()
    assert len(rows) == 7
    wqs = [r.wq_seconds for r in rows]
    assert wqs == sorted(wqs, reverse=True)
    assert wqs[0] > 5 * wqs[-1]

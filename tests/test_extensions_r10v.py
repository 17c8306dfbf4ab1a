"""Round-10 web-analytics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bounce_rate_bounds(spark):
    from kcore_spark.queries.extensions_r10v import q_bounce_rate

    rows = q_bounce_rate(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert 0 <= r.bounce_rate <= 1


def test_depth_hist_shares(spark):
    from kcore_spark.queries.extensions_r10v import q_session_depth_hist

    rows = q_session_depth_hist(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.session_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n_events >= r.n_sessions


def test_entry_exit_multi_event_only(spark):
    from kcore_spark.queries.extensions_r10v import q_entry_exit_matrix

    rows = q_entry_exit_matrix(spark, SF_DIR).collect()
    assert rows
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)

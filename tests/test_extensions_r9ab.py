"""Within-session funnel invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_session_funnel_monotone(spark):
    """Funnel counts are monotone (step k+1 <= step k) and the
    session-scoped conversion can never exceed the user-window form's
    per-session ceiling of 1."""
    from kcore_spark.queries.extensions_r9ab import q_session_funnel

    r = q_session_funnel(spark, SF_DIR).collect()[0]
    assert r.n_sessions >= r.viewed >= r.clicked_after_view >= r.purchased_after_click
    assert r.viewed > 0
    if r.session_conversion is not None:
        assert 0.0 <= r.session_conversion <= 1.0

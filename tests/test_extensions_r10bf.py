"""Round-10 operability block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_apdex_bounds(spark):
    """Apdex in [0,1]; satisfied+tolerating <= n."""
    from kcore_spark.queries.extensions_r10bf import q_apdex_score

    rows = q_apdex_score(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.satisfied + r.tolerating <= r.n
        assert 0 <= r.apdex <= 1


def test_profile_drift_null_split(spark):
    """Hash halves of one table: small relative drift everywhere."""
    from kcore_spark.queries.extensions_r10bf import q_profile_drift

    rows = q_profile_drift(spark, SF_DIR).collect()
    assert [r.metric for r in rows] == ["mean_price", "n_priorities", "urgent_rate"]
    for r in rows:
        assert r.half0 > 0 and r.half1 > 0
        assert r.rel_drift < 0.25


def test_timeout_sensitivity_monotone(spark):
    """Longer timeout -> fewer (or equal) sessions; events/session
    grows with the timeout."""
    from kcore_spark.queries.extensions_r10bf import q_session_timeout_sensitivity

    rows = q_session_timeout_sensitivity(spark, SF_DIR).collect()
    assert [r.timeout_s for r in rows] == [600, 1800, 3600]
    ns = [r.n_sessions for r in rows]
    assert ns == sorted(ns, reverse=True)
    eps = [r.events_per_session for r in rows]
    assert eps == sorted(eps)

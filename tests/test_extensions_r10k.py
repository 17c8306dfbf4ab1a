"""Round-10 sequence/privacy-ops block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_transition_entropy_bounded_by_log_states(spark):
    from kcore_spark.queries.extensions_r10k import q_transition_entropy

    rows = q_transition_entropy(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.entropy_nats <= math.log(r.n_next_states) + 1e-6
        assert r.n_next_states <= 5


def test_contribution_bounding_monotone(spark):
    """Bigger cap keeps more mass; kept <= raw; shares ascend to <= 1."""
    from kcore_spark.queries.extensions_r10k import q_contribution_bounding

    rows = q_contribution_bounding(spark, SF_DIR).collect()
    assert [r.cap for r in rows] == [4, 8, 16]
    shares = [r.kept_share for r in rows]
    assert shares == sorted(shares)
    for r in rows:
        assert r.kept_events <= r.raw_events
        assert 0 < r.kept_share <= 1


def test_interarrival_cv_positive(spark):
    from kcore_spark.queries.extensions_r10k import q_interarrival_cv

    rows = q_interarrival_cv(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_gaps > 0
        assert r.mean_gap_hours > 0
        assert r.cv > 0

"""ESS invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_ess_bounds(spark):
    """1 <= ESS <= n always; positive weights with moderate spread
    give a ratio well above the degenerate floor."""
    from kcore_spark.queries.extensions_r9ai import q_effective_sample_size

    r = q_effective_sample_size(spark, SF_DIR).collect()[0]
    assert 1.0 <= r.ess <= r.n
    assert 0.0 < r.ess_ratio <= 1.0
    assert r.ess_ratio > 0.3  # totalprice spread is mild, not degenerate

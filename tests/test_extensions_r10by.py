"""Round-10 marketing-science-III block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_markov_attribution_shares(spark):
    from kcore_spark.queries.extensions_r10by import q_markov_attribution

    rows = q_markov_attribution(spark, SF_DIR).collect()
    assert len(rows) == 4
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        # removing a channel can only hurt (or not change) conversion
        assert r.removal_effect >= -1e-6


def test_time_decay_credit_totals(spark):
    from kcore_spark.queries.extensions_r10by import q_time_decay_attribution

    rows = q_time_decay_attribution(spark, SF_DIR).collect()
    assert rows
    total = sum(r.credit for r in rows)
    # total credit == number of attributed purchases (each sums to 1)
    assert abs(total - round(total)) < 1e-3
    assert all(r.n_touches > 0 for r in rows)


def test_adstock_elasticity_finite(spark):
    from kcore_spark.queries.extensions_r10by import q_adstock_elasticity

    r = q_adstock_elasticity(spark, SF_DIR).collect()[0]
    assert r.n > 10
    assert r.theta == 0.5
    assert math.isfinite(r.elasticity)
    assert 0.0 <= r.r2 <= 1.0

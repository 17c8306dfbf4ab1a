"""Round-10 decision-analysis block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_evpi_nonnegative(spark):
    from kcore_spark.queries.extensions_r10df import q_evpi

    r = q_evpi(spark, SF_DIR).collect()[0]
    # foresight can never hurt
    assert r.evpi >= -1e-6
    assert r.expected_with_foresight >= r.best_expected_payoff - 1e-6


def test_minimax_regret(spark):
    from kcore_spark.queries.extensions_r10df import q_minimax_regret

    rows = q_minimax_regret(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert sum(r.is_minimax_choice for r in rows) == 1
    assert sum(r.is_ev_choice for r in rows) == 1
    for r in rows:
        assert r.max_regret >= 0
    mm = next(r for r in rows if r.is_minimax_choice)
    assert mm.max_regret == min(r.max_regret for r in rows)


def test_fosd_counts(spark):
    from kcore_spark.queries.extensions_r10df import q_stochastic_dominance

    r = q_stochastic_dominance(spark, SF_DIR).collect()[0]
    assert r.n_thresholds > 0
    assert 0 <= r.n_ev_dominates <= r.n_thresholds

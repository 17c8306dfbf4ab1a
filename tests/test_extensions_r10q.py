"""Round-10 causal/survival block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_rmst_bounded_by_tau(spark):
    """0 < RMST <= tau; RMST <= tau * S(0)=1 trivially, and it must
    exceed tau * S(last) (survival only decreases)."""
    from kcore_spark.queries.extensions_r10q import RMST_TAU, q_rmst

    r = q_rmst(spark, SF_DIR).collect()[0]
    assert r.tau_days == RMST_TAU
    assert 0 < r.rmst_days <= RMST_TAU
    assert r.n_steps > 0


def test_iv_wald_consistency(spark):
    from kcore_spark.queries.extensions_r10q import q_iv_wald

    r = q_iv_wald(spark, SF_DIR).collect()[0]
    assert r.n0 > 0 and r.n1 > 0
    if r.first_stage == 0:
        # saturated tiny fixture: weak-instrument case surfaces as NULL
        assert r.wald_iv is None
    else:
        assert abs(r.wald_iv - r.reduced_form / r.first_stage) < max(
            1.0, abs(r.wald_iv) * 0.01
        )


def test_parallel_trends_gap_identity(spark):
    from kcore_spark.queries.extensions_r10q import q_parallel_trends

    r = q_parallel_trends(spark, SF_DIR).collect()[0]
    assert r.n_months >= 3
    assert abs(r.trend_gap - (r.slope_treated - r.slope_control)) < 1e-5

"""Round-10 lifecycle-signal block invariants."""

from __future__ import annotations

from .conftest import SF_DIR, SF_DIR_MED


def test_churn_hazard_bounds(spark):
    from kcore_spark.queries.extensions_r10z import q_churn_hazard

    # sf0.001's window is too short for uncensored weeks — use sf0.01
    rows = q_churn_hazard(spark, SF_DIR_MED).collect()
    assert rows
    # at-risk counts shrink as tenure grows
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
    for r in rows:
        assert 0 <= r.n_churned <= r.n_at_risk
        assert 0 <= r.hazard <= 1


def test_storey_pi0_bounds(spark):
    from kcore_spark.queries.extensions_r10z import q_storey_pi0

    r = q_storey_pi0(spark, SF_DIR).collect()[0]
    assert r.m_hypotheses == 25
    assert 0 <= r.pi0_hat <= 1


def test_peaks_above_band(spark):
    from kcore_spark.queries.extensions_r10z import q_peak_detection

    rows = q_peak_detection(spark, SF_DIR).collect()
    for r in rows:
        assert r.z_score > 1.0  # strictly above mean + 1 sd

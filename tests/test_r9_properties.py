"""Structural invariants of the round-9 analytics additions — the
properties a hash-match against one fixture cannot pin by itself
(monotonicity, conservation, bounds). Complements the oracle-parity
sweep the same way tests/test_stats_fuzz.py does for the r8 block."""

from __future__ import annotations

from .conftest import SF_DIR


def test_isotonic_fit_is_monotone_and_mean_preserving(spark):
    """PAVA output must be non-decreasing in the bin order, stay inside
    [0,1], and preserve the weighted mean of the raw rates (the
    L2-projection property)."""
    from kcore_spark.queries.extensions_r9d import q_isotonic_calibration

    rows = q_isotonic_calibration(spark, SF_DIR).collect()
    assert rows
    iso = [r.iso_rate for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(iso, iso[1:])), "not monotone"
    assert all(0.0 <= v <= 1.0 for v in iso)
    n_tot = sum(r.n for r in rows)
    pos_tot = sum(r.n_pos for r in rows)
    fit_mass = sum(r.n * r.iso_rate for r in rows)
    assert abs(fit_mass - pos_tot) / n_tot < 1e-6, "weighted mean not preserved"


def test_t_closeness_is_a_bounded_distance(spark):
    """Ordered EMD over probability CDFs lies in [0,1]; singleton-free
    fixture groups must produce a finite t for every group."""
    from kcore_spark.queries.extensions_r9c import q_t_closeness

    rows = q_t_closeness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.t_emd <= 1.0
        assert r.n_rows >= 1


def test_nelson_aalen_dominates_km_log_survival(spark):
    """H_NA(t) >= -ln(S_KM(t)) pointwise (Jensen: sum d/n >= sum
    -ln(1 - d/n) is false in general — the true relation is
    -ln(S_KM) >= H_NA); both estimators share the life table, so the
    curves must be comparable at every event time."""
    from kcore_spark.queries.extensions_r8c import q_kaplan_meier
    from kcore_spark.queries.extensions_r9e import q_nelson_aalen

    import math

    na = {r.dur: r.cum_hazard for r in q_nelson_aalen(spark, SF_DIR).collect()}
    km = {r.dur: r.survival for r in q_kaplan_meier(spark, SF_DIR).collect()}
    shared = set(na) & set(km)
    assert shared
    for t in shared:
        if km[t] > 0:
            assert -math.log(km[t]) >= na[t] - 1e-9


def test_holt_forecast_extends_level_by_trend(spark):
    from kcore_spark.queries.extensions_r9d import q_holt_forecast

    rows = q_holt_forecast(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_steps >= 1
        # level/trend/forecast are rounded independently; the identity
        # holds within the rounding quantum
        assert abs(r.forecast_1 - (r.level + r.trend)) < 2e-6


def test_quantile_normalize_conserves_rows(spark, duck):
    from kcore_spark.queries.extensions_r9b import q_quantile_normalize

    rows = q_quantile_normalize(spark, SF_DIR).collect()
    got = {r.event_type: r.n for r in rows}
    want = dict(
        duck.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert got == want


def test_sprt_decision_is_first_crossing(spark):
    """The reported stopping step must actually cross the boundary its
    decision names (the oracle pins the value; this pins the sign)."""
    import math

    from kcore_spark.queries.extensions_r9c import (
        ALPHA,
        BETA,
        q_sprt_stopping,
    )

    up = round(math.log((1 - BETA) / ALPHA), 6)
    lo = round(math.log(BETA / (1 - ALPHA)), 6)
    for r in q_sprt_stopping(spark, SF_DIR).collect():
        if r.decision == "accept_h1":
            assert r.llr_at_decision >= up - 1e-9
        else:
            assert r.llr_at_decision <= lo + 1e-9

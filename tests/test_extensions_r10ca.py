"""Round-10 survival-III block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_life_table_monotone(spark):
    from kcore_spark.queries.extensions_r10ca import q_life_table

    rows = q_life_table(spark, SF_DIR).collect()
    assert rows
    ls = [r.l_x for r in rows]
    assert ls == sorted(ls, reverse=True)  # cohort shrinks
    ss = [r.s_start for r in rows]
    assert ss == sorted(ss, reverse=True)  # survival non-increasing
    assert abs(ss[0] - 1.0) < 1e-9
    for r in rows:
        assert 0.0 <= r.q_x <= 1.0
        assert r.d_x + r.c_x <= r.l_x


def test_cif_bounds(spark):
    from kcore_spark.queries.extensions_r10ca import q_cumulative_incidence

    rows = q_cumulative_incidence(spark, SF_DIR).collect()
    assert rows
    causes = {r.cause for r in rows}
    assert causes <= {"F", "O", "P"}
    # per horizon, total incidence <= 1
    from collections import defaultdict

    byh = defaultdict(float)
    for r in rows:
        assert 0.0 <= r.cif <= 1.0
        byh[r.horizon_months] += r.cif
    for tot in byh.values():
        assert tot <= 1.0 + 1e-6
    # CIF non-decreasing in horizon per cause
    byc = defaultdict(list)
    for r in sorted(rows, key=lambda r: r.horizon_months):
        byc[r.cause].append(r.cif)
    for vals in byc.values():
        assert vals == sorted(vals)


def test_gompertz_fit(spark):
    from kcore_spark.queries.extensions_r10ca import q_gompertz_fit

    r = q_gompertz_fit(spark, SF_DIR).collect()[0]
    assert r.n_points > 5
    assert r.aging_rate_c > 0
    assert 0.0 <= r.r2 <= 1.0

"""Round-10 EDF goodness-of-fit block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_anderson_darling_rejects_uniformish(spark):
    """o_totalprice is far from normal: A² must be large and finite."""
    from kcore_spark.queries.extensions_r10ai import q_anderson_darling

    r = q_anderson_darling(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    assert r.ad_stat > 1.0  # normality clearly rejected
    assert r.ad_stat < r.n  # bounded (no ln(0) blowup)


def test_cvm_positive_and_consistent(spark):
    """W² positive; same-direction verdict as AD (both reject)."""
    from kcore_spark.queries.extensions_r10ai import q_cramer_von_mises

    r = q_cramer_von_mises(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    assert 0.46 < r.cvm_stat  # >> 0.46 critical value at 1%


def test_qq_table_monotone(spark):
    """19 rows; sample quantiles and z-scores monotone in p; the
    median's sample_z is near where a right-skewed distribution puts
    it (below 0... or above — just bounded)."""
    from kcore_spark.queries.extensions_r10ai import q_qq_normal

    rows = q_qq_normal(spark, SF_DIR).collect()
    assert len(rows) == 19
    qs = [r.sample_q for r in rows]
    zs = [r.sample_z for r in rows]
    assert qs == sorted(qs)
    assert zs == sorted(zs)
    assert all(-4 < z < 4 for z in zs)

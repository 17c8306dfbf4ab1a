"""Round-10 circular-statistics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_circular_stats_bounds(spark):
    """R in [0,1]; mean hour on the clock; variance complements R."""
    from kcore_spark.queries.extensions_r10bp import q_circular_stats

    rows = q_circular_stats(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.resultant_r <= 1
        assert 0 <= r.mean_hour < 24
        assert abs(r.circular_variance - (1 - r.resultant_r)) < 1e-5


def test_rayleigh_bounds(spark):
    """z >= 0; p in [0,1]."""
    from kcore_spark.queries.extensions_r10bp import q_rayleigh_test

    rows = q_rayleigh_test(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.rayleigh_z >= 0
        assert 0 <= r.p_approx <= 1


def test_von_mises_kappa_monotone_in_r(spark):
    """kappa grows with R across types; near-uniform data gives a
    small kappa."""
    from kcore_spark.queries.extensions_r10bp import q_von_mises_kappa

    rows = sorted(
        q_von_mises_kappa(spark, SF_DIR).collect(), key=lambda r: r.resultant_r
    )
    ks = [r.vm_kappa for r in rows]
    assert ks == sorted(ks)
    assert all(k >= 0 for k in ks)

"""Round-10 spatial-statistics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_quadrat_random_points(spark):
    """md5-uniform points: VMR near 1 (Poisson-ish), grid covered."""
    from kcore_spark.queries.extensions_r10bq import q_quadrat_test

    r = q_quadrat_test(spark, SF_DIR).collect()[0]
    assert r.n_cells == 72
    assert r.occupied > 36
    assert 0.3 < r.vmr < 3.0
    assert r.chi2 > 0


def test_hotspot_z_scores(spark):
    """Top-5 hotspots: descending z, neighborhoods of <= 9 cells."""
    from kcore_spark.queries.extensions_r10bq import q_hotspot_gi

    rows = q_hotspot_gi(spark, SF_DIR).collect()
    assert len(rows) == 5
    zs = [r.gi_z for r in rows]
    assert zs == sorted(zs, reverse=True)
    for r in rows:
        assert 1 <= r.m <= 9


def test_nearest_facility_bounds(spark):
    """All 25 nations; averages within half Earth circumference."""
    from kcore_spark.queries.extensions_r10bq import q_nearest_facility

    rows = q_nearest_facility(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.n > 0
        assert 0 < r.avg_km <= r.max_km <= 20016

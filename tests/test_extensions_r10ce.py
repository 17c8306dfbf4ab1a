"""Round-10 forecast-evaluation-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_combination_panel(spark):
    from kcore_spark.queries.extensions_r10ce import q_forecast_combination

    rows = q_forecast_combination(spark, SF_DIR).collect()
    assert [r.method for r in rows] == ["combo", "drift", "mean", "naive", "snaive"]
    for r in rows:
        assert r.n_test > 5
        assert r.mae >= 0
        assert r.rmse >= r.mae - 1e-9  # RMSE >= MAE always


def test_dm_finite(spark):
    from kcore_spark.queries.extensions_r10ce import q_diebold_mariano

    r = q_diebold_mariano(spark, SF_DIR).collect()[0]
    assert r.n_test > 5
    assert math.isfinite(r.dm_stat)
    assert 0.0 <= r.p_two_sided <= 1.0


def test_coverage_ordering(spark):
    from kcore_spark.queries.extensions_r10ce import q_interval_coverage

    rows = q_interval_coverage(spark, SF_DIR).collect()
    assert [r.level for r in rows] == ["80", "95"]
    for r in rows:
        assert 0.0 <= r.coverage <= 1.0
        assert r.covered <= r.n_test
    # the wider band covers at least as much
    assert rows[1].coverage >= rows[0].coverage

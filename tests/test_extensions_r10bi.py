"""Round-10 in-engine ML III block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_ridge_shrinks_coefficients(spark):
    """Coefficient magnitudes shrink monotonically along the λ path."""
    from kcore_spark.queries.extensions_r10bi import q_ridge_regression

    rows = q_ridge_regression(spark, SF_DIR).collect()
    assert [r.ridge_lambda for r in rows] == [0.0, 1000.0, 100000.0]
    mags = [abs(r.b1) + abs(r.b2) for r in rows]
    assert mags[0] >= mags[1] >= mags[2]


def test_kfold_cv_folds(spark):
    """5 folds; slopes agree across folds (same population); MSE
    positive and similar across folds."""
    from kcore_spark.queries.extensions_r10bi import q_kfold_cv

    rows = q_kfold_cv(spark, SF_DIR).collect()
    assert [r.fold for r in rows] == [0, 1, 2, 3, 4]
    slopes = [r.slope for r in rows]
    assert max(slopes) - min(slopes) < 10 * (abs(sum(slopes)) / 5 + 1)
    for r in rows:
        assert r.n_test > 100
        assert r.test_mse > 0


def test_bagged_stumps_beat_chance(spark):
    """Ensemble at least matches the majority-class baseline."""
    from kcore_spark.queries.extensions_r10bi import q_bagged_stumps

    r = q_bagged_stumps(spark, SF_DIR).collect()[0]
    assert r.n > 1000
    for t in (r.stump1_threshold, r.stump2_threshold, r.stump3_threshold):
        assert 50000 <= t <= 450000
    # the base rate of 1-URGENT is ~20%: predicting majority gives ~0.8
    assert r.ensemble_accuracy >= 0.5

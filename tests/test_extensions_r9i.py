"""Structural invariants of the round-9 batch-I additions (seasonal
decomposition, CCF, jackknife, item-item CF)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_decomposition_seasonal_indices_are_centered(spark):
    """Seasonal indices must cover 24 hours and sum to ~0 (centering
    is part of the estimator's contract)."""
    from kcore_spark.queries.extensions_r9i import q_classical_decomposition

    rows = q_classical_decomposition(spark, SF_DIR).collect()
    assert len(rows) == 24
    assert sorted(r.hod for r in rows) == list(range(24))
    assert abs(sum(r.seasonal_idx for r in rows)) < 1e-4


def test_ccf_lags_symmetric_domain_and_bounded(spark):
    """13 lags (−6..6), every coefficient in [−1, 1], and lag windows
    near the edges lose pairs monotonically (|n_pairs| shrinks as |lag|
    grows on a contiguous spine)."""
    from kcore_spark.queries.extensions_r9i import q_ccf_lagged

    rows = {r.lag: r for r in q_ccf_lagged(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(-6, 7))
    for r in rows.values():
        assert -1.0 <= r.ccf <= 1.0
    assert rows[0].n_pairs >= rows[6].n_pairs
    assert rows[0].n_pairs >= rows[-6].n_pairs


def test_jackknife_se_close_to_classic_se(spark):
    """For the MEAN the delete-a-group jackknife must agree with the
    classic s/√n within a loose factor (they estimate the same
    quantity); exact equality is not expected with G=20 groups."""
    import duckdb

    from kcore_spark.queries.extensions_r9i import q_jackknife_variance

    r = q_jackknife_variance(spark, SF_DIR).collect()[0]
    assert r.g_buckets == 20
    classic = duckdb.sql(
        f"SELECT STDDEV_SAMP(o_totalprice) / SQRT(COUNT(*)), AVG(o_totalprice) "
        f"FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()
    assert abs(r.theta_hat - classic[1]) < 1e-3
    assert 0.5 * classic[0] < r.jackknife_se < 2.0 * classic[0]


def test_item_cf_scores_valid(spark):
    """Cosine in (0, 1]; cooc >= 2 (the HAVING floor); pairs are
    canonical (ia < ib) and sorted by score."""
    from kcore_spark.queries.extensions_r9i import q_item_item_cosine

    rows = q_item_item_cosine(spark, SF_DIR).collect()
    assert rows
    scores = [r.cosine for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0.0 < r.cosine <= 1.0
        assert r.cooc >= 2
        assert r.ia < r.ib

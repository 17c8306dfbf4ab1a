"""Structural invariants of the round-9 batch-K additions
(silhouette, stationary distribution, Kendall tau-b)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_silhouette_bounded(spark):
    """Mean silhouette per label lies in [−1, 1] and every fixture
    label appears."""
    from kcore_spark.queries.extensions_r9k import q_silhouette

    rows = q_silhouette(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.n_vecs > 0


def test_stationary_distribution_is_a_distribution(spark):
    """π sums to 1 (stochasticity preserved through five squarings)
    and every component is non-negative; P^20 of an irreducible chain
    should also be close to a fixed point: π·P ≈ π within the
    convergence tolerance of 20 steps."""
    from kcore_spark.queries.extensions_r9k import q_stationary_distribution

    rows = q_stationary_distribution(spark, SF_DIR).collect()
    assert rows
    total = sum(r.pi for r in rows)
    assert abs(total - 1.0) < 1e-4
    for r in rows:
        assert r.pi >= 0.0


def test_kendall_tau_consistent_with_spearman_sign(spark):
    """tau-b in [−1, 1]; concordant+discordant never exceeds the
    untied pair bound; the sign agrees with q_spearman_corr on the
    same two columns (both measure monotone association)."""
    from kcore_spark.queries.extensions_r9g import q_spearman_corr
    from kcore_spark.queries.extensions_r9k import q_kendall_tau

    t = q_kendall_tau(spark, SF_DIR).collect()[0]
    assert -1.0 <= t.tau_b <= 1.0
    assert t.concordant + t.discordant <= t.n * (t.n - 1) // 2
    rho = q_spearman_corr(spark, SF_DIR).collect()[0].spearman_rho
    if abs(rho) > 0.01 and abs(t.tau_b) > 0.01:
        assert (rho > 0) == (t.tau_b > 0)

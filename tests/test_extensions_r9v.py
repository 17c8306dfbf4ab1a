"""Structural invariants of the round-9 batch-V additions (feature
hashing, Neyman allocation, Gaussian EM)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_feature_hashing_shares_sum_to_one(spark):
    from kcore_spark.queries.extensions_r9v import q_feature_hashing

    rows = q_feature_hashing(spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert 0 <= r.octant <= 7
        assert r.l1 >= 0
        by_src[r.source] = by_src.get(r.source, 0.0) + r.energy_share
    for src, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-4


def test_neyman_allocation_sums_to_budget(spark):
    """Allocations sum exactly to the budget (largest-remainder) and
    the highest-variance×size stratum gets the largest allocation."""
    from kcore_spark.queries.extensions_r9v import _NEYMAN_BUDGET, q_neyman_allocation

    rows = q_neyman_allocation(spark, SF_DIR).collect()
    assert sum(r.allocated for r in rows) == _NEYMAN_BUDGET
    best = max(rows, key=lambda r: r.stratum_size * r.sd_h)
    assert best.allocated == max(r.allocated for r in rows)


def test_gaussian_em_components_ordered_and_tight(spark):
    """After 4 rounds: mixing weight in (0,1), both sigmas positive
    and smaller than the marginal sigma (the split explains variance),
    mu1 <= mu2 (init order preserved by EM's monotone likelihood on a
    unimodal-ish target)."""
    import duckdb

    from kcore_spark.queries.extensions_r9v import q_gaussian_em

    r = q_gaussian_em(spark, SF_DIR).collect()[0]
    assert 0.0 < r.pi2 < 1.0
    assert r.s1 > 0 and r.s2 > 0
    assert r.mu1 <= r.mu2
    stats = duckdb.sql(
        f"SELECT STDDEV_SAMP(LN(o_totalprice)), AVG(LN(o_totalprice)) "
        f"FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()
    marginal_sd, marginal_mu = stats
    # variance decomposition: pi_k * s_k^2 <= marginal variance, so
    # s_k <= marginal_sd / sqrt(pi_k) (a LOW-weight component may well
    # exceed the marginal sd — the naive bound is wrong)
    assert r.s1 <= marginal_sd / max(1.0 - r.pi2, 1e-6) ** 0.5 * 1.05
    assert r.s2 <= marginal_sd / max(r.pi2, 1e-6) ** 0.5 * 1.05
    # and the mixture mean must reproduce the marginal mean
    mix_mu = (1.0 - r.pi2) * r.mu1 + r.pi2 * r.mu2
    assert abs(mix_mu - marginal_mu) < 0.02

"""Round-10 actuarial chain-ladder block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_chain_ladder_factors(spark):
    from kcore_spark.queries.extensions_r10bt import q_chain_ladder

    rows = q_chain_ladder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.factor >= 1.0  # cumulative paid never decreases
        assert r.n_origins >= 1
    # later devs are observed by fewer (or equal) origins
    ns = [r.n_origins for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_bf_blend_between_paid_and_cl(spark):
    from kcore_spark.queries.extensions_r10bt import q_bornhuetter_ferguson

    rows = q_bornhuetter_ferguson(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.cdf >= 1.0
        assert r.ult_chain_ladder >= r.paid_to_date - 0.01
        # BF ultimate also never projects below paid-to-date
        assert r.ult_bf >= r.paid_to_date - 0.01
    # mature origins are fully developed: cdf == 1, ultimates == paid
    mature = [r for r in rows if r.cdf == 1.0]
    assert mature
    for r in mature:
        assert abs(r.ult_chain_ladder - r.paid_to_date) < 0.01
        assert abs(r.ult_bf - r.paid_to_date) < 0.01


def test_mack_sigma_nonnegative(spark):
    from kcore_spark.queries.extensions_r10bt import q_mack_sigma

    rows = q_mack_sigma(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.sigma2 >= 0
        assert r.n_origins > 1

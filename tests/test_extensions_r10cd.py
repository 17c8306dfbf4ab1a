"""Round-10 blocking-quality block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_blocking_quality_bounds(spark):
    from kcore_spark.queries.extensions_r10cd import q_blocking_quality

    r = q_blocking_quality(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.reduction_ratio <= 1.0
    assert 0.0 <= r.pairs_completeness <= 1.0
    assert r.true_coblocked <= r.true_pairs
    assert r.cand_pairs <= r.n * (r.n - 1) // 2
    assert 0.0 <= r.f_blocking <= 1.0


def test_block_skew_bounds(spark):
    from kcore_spark.queries.extensions_r10cd import q_block_size_skew

    r = q_block_size_skew(spark, SF_DIR).collect()[0]
    assert r.max_block >= r.mean_block
    assert 0.0 <= r.gini_block_sizes <= 1.0
    assert 0.0 < r.max_block_pair_share <= 1.0


def test_sweep_monotone(spark):
    from kcore_spark.queries.extensions_r10cd import q_blocking_key_sweep

    rows = q_blocking_key_sweep(spark, SF_DIR).collect()
    assert [r.bits for r in rows] == [4, 8, 12]
    # more bits -> fewer candidate pairs -> higher RR, lower-or-equal PC
    rrs = [r.reduction_ratio for r in rows]
    pcs = [r.pairs_completeness for r in rows]
    assert rrs == sorted(rrs)
    assert pcs == sorted(pcs, reverse=True)

"""Round-10 data-placement block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_ring_covers_all_keys(spark):
    from kcore_spark.queries.extensions_r10cc import q_consistent_hash_ring

    rows = q_consistent_hash_ring(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    total = sum(r.n_keys for r in rows)
    assert total > 0
    # 32 vnodes keep the spread sane: no node owns the majority
    assert max(r.n_keys for r in rows) < total * 0.5


def test_hrw_minimal_movement(spark):
    from kcore_spark.queries.extensions_r10cc import q_rendezvous_hashing

    rows = q_rendezvous_hashing(spark, SF_DIR).collect()
    assert len(rows) == 8
    byn = {r.node: r for r in rows}
    # HRW: ONLY the removed node's keys move
    assert byn["n3"].n_moved_away == byn["n3"].n_keys
    for n, r in byn.items():
        if n != "n3":
            assert r.n_moved_away == 0


def test_ring_rebalance_invariant(spark):
    from kcore_spark.queries.extensions_r10cc import q_ring_rebalance

    r = q_ring_rebalance(spark, SF_DIR).collect()[0]
    assert r.only_moves_to_new  # moved keys land only on the new node
    assert r.n_moved == r.n_to_new
    # movement should be in the ballpark of 1/9 (generous envelope)
    assert 0.02 <= r.moved_frac <= 0.30

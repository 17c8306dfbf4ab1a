"""Round-10 network-robustness block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_hub_attack_hurts_more(spark):
    from kcore_spark.queries.extensions_r10dm import q_attack_edge_survival

    rows = q_attack_edge_survival(spark, SF_DIR).collect()
    by = {r.strategy: r for r in rows}
    assert set(by) == {"hub_1pct", "random_1pct"}
    # removing hubs destroys at least as many edges as random removal
    assert by["hub_1pct"].survival <= by["random_1pct"].survival + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.edges_surviving <= r.edges_total


def test_attack_sweep_monotone(spark):
    from kcore_spark.queries.extensions_r10dm import q_attack_sweep

    rows = q_attack_sweep(spark, SF_DIR).collect()
    assert [r.removal_pct for r in rows] == [1, 5, 10]
    survs = [r.survival for r in rows]
    assert survs == sorted(survs, reverse=True)


def test_percolation_threshold(spark):
    from kcore_spark.queries.extensions_r10dm import q_percolation_threshold

    r = q_percolation_threshold(spark, SF_DIR).collect()[0]
    assert r.mean_degree > 0
    assert r.kappa >= r.mean_degree  # <k^2>/<k> >= <k>
    assert 0.0 <= r.percolation_threshold <= 1.0

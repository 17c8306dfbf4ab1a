"""Round-10 access-locality block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_reuse_distance(spark):
    from kcore_spark.queries.extensions_r10di import q_reuse_distance

    r = q_reuse_distance(spark, SF_DIR).collect()[0]
    assert r.n_reuses > 0
    assert r.mean_gap_days >= 0
    # P(reuse <= h) is monotone in h
    assert r.p_reuse_7d <= r.p_reuse_30d <= r.p_reuse_90d <= 1.0


def test_hot_set_stability(spark):
    from kcore_spark.queries.extensions_r10di import q_hot_set_stability

    r = q_hot_set_stability(spark, SF_DIR).collect()[0]
    assert r.n_month_pairs > 0
    assert 0.0 <= r.min_jaccard <= r.mean_jaccard <= r.max_jaccard <= 1.0


def test_cold_access_decay(spark):
    from kcore_spark.queries.extensions_r10di import q_cold_access_rate

    rows = q_cold_access_rate(spark, SF_DIR).collect()
    assert [r.quarter for r in rows] == [0, 1, 2, 3]
    rates = [r.cold_rate for r in rows]
    # compulsory misses decay: the first quarter is the coldest
    assert rates[0] == max(rates)
    for r in rows:
        assert 0.0 <= r.cold_rate <= 1.0

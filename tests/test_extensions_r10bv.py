"""Round-10 inequality/segregation block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_atkinson_ordering(spark):
    from kcore_spark.queries.extensions_r10bv import q_atkinson_index

    r = q_atkinson_index(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.atkinson_05 <= 1.0
    assert 0.0 <= r.atkinson_2 <= 1.0
    # more aversion -> more measured inequality
    assert r.atkinson_2 >= r.atkinson_05
    assert r.mean_spend > 0


def test_dissimilarity_range(spark):
    from kcore_spark.queries.extensions_r10bv import q_dissimilarity_index

    r = q_dissimilarity_index(spark, SF_DIR).collect()[0]
    assert r.n_units == 25
    assert 0.0 <= r.dissimilarity <= 1.0
    assert 0.0 <= r.isolation_a <= 1.0


def test_hoover_range(spark):
    from kcore_spark.queries.extensions_r10bv import q_hoover_index

    r = q_hoover_index(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.hoover <= 0.5  # Hoover is bounded by (n-1)/n * 0.5-ish
    assert r.total_spend > 0

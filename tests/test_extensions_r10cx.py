"""Round-10 forensic-accounting-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_benford_second_digit(spark):
    from kcore_spark.queries.extensions_r10cx import q_benford_second_digit

    rows = q_benford_second_digit(spark, SF_DIR).collect()
    assert [r.d for r in rows] == list(range(10))
    assert all(r.chi2 >= 0 for r in rows)
    assert all(r.expected > 0 for r in rows)


def test_last_digit(spark):
    from kcore_spark.queries.extensions_r10cx import q_last_digit_uniformity

    r = q_last_digit_uniformity(spark, SF_DIR).collect()[0]
    assert r.k == 10 and r.df == 9
    assert r.chi2_uniform >= 0


def test_structuring(spark):
    from kcore_spark.queries.extensions_r10cx import q_structuring_screen

    rows = q_structuring_screen(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_orders >= 2
        assert r.day_total >= 200000
        assert r.largest_single < 200000

"""Round-10 corpus-linguistics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_keyness_shape(spark):
    from kcore_spark.queries.extensions_r10cm import q_dunning_keyness

    rows = q_dunning_keyness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.rank <= 3
        assert r.ll >= 0


def test_kilgarriff_ordered(spark):
    from kcore_spark.queries.extensions_r10cm import q_kilgarriff_chi2

    rows = q_kilgarriff_chi2(spark, SF_DIR).collect()
    assert rows
    cs = [r.chi2 for r in rows]
    assert cs == sorted(cs, reverse=True)
    for r in rows:
        assert r.sa < r.sb
        assert r.chi2 >= 0


def test_burrows_delta_bounds(spark):
    from kcore_spark.queries.extensions_r10cm import q_burrows_delta

    rows = q_burrows_delta(spark, SF_DIR).collect()
    assert rows
    ds = [r.delta for r in rows]
    assert ds == sorted(ds)  # closest pairs first
    assert all(d >= 0 for d in ds)

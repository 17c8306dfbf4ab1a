"""Fairness-slice report invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_fairness_slices_disparity_consistent(spark):
    from kcore_spark.queries.extensions_r9ae import q_fairness_slices

    rows = q_fairness_slices(spark, SF_DIR).collect()
    disp = [r for r in rows if r.slice == "__disparity__"][0]
    segs = [r for r in rows if r.slice != "__disparity__"]
    assert segs
    rates = [r.rate for r in segs]
    assert abs(disp.rate - (max(rates) - min(rates))) < 2e-6
    for r in segs:
        assert r.ci_low <= r.rate <= r.ci_high

"""Round-10 prep-diagnostic block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bin_planner_sanity(spark):
    """FD and Scott recommendations are positive; Sturges small."""
    from kcore_spark.queries.extensions_r10ae import q_histogram_bin_planner

    r = q_histogram_bin_planner(spark, SF_DIR).collect()[0]
    assert r.value_range > 0
    assert 2 <= r.sturges_bins <= 64
    assert r.scott_bins >= 1 and r.fd_bins >= 1
    assert r.fd_bin_width > 0


def test_log_diag_shrinks_skew(spark):
    """o_totalprice is right-skewed; log1p must shrink |skewness|."""
    from kcore_spark.queries.extensions_r10ae import q_log_transform_diag

    r = q_log_transform_diag(spark, SF_DIR).collect()[0]
    assert r.n > 0
    assert abs(r.skew_log1p) < abs(r.skew_raw) or r.log_recommended is False

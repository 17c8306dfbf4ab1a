"""Round-10 reliability-engineering block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_mtbf_mttr_positive(spark):
    """Gaps positive; recovery faster than failure spacing (errors
    are 1/5 of events, so any-event recovery is quicker)."""
    from kcore_spark.queries.extensions_r10br import q_mtbf_mttr

    r = q_mtbf_mttr(spark, SF_DIR).collect()[0]
    assert r.n_intervals > 10 and r.n_recoveries > 10
    assert r.mtbf_s > 0 and r.mttr_s > 0
    assert r.mttr_s < r.mtbf_s


def test_availability_bounds(spark):
    """Every day row: availability in [0,1]; downtime <= observed."""
    from kcore_spark.queries.extensions_r10br import q_availability

    rows = q_availability(spark, SF_DIR).collect()
    assert len(rows) >= 25
    for r in rows:
        assert 0 <= r.down_s <= r.observed_s + 3600  # cap slack
        assert 0 <= r.availability <= 1


def test_error_bursts_shape(spark):
    """If bursts exist they are >= 3 long by definition."""
    from kcore_spark.queries.extensions_r10br import q_error_bursts

    r = q_error_bursts(spark, SF_DIR).collect()[0]
    if r.n_bursts and r.n_bursts > 0:
        assert r.avg_len >= 3
        assert r.max_len >= r.avg_len - 1e-9

"""Round-10 retry-analytics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR_MED


def test_retry_amplification(spark):
    from kcore_spark.queries.extensions_r10dn import q_retry_amplification

    rows = q_retry_amplification(spark, SF_DIR_MED).collect()
    assert rows
    total = rows[0].total_amplification
    assert abs(sum(r.amplification for r in rows) - total) < 1e-4
    for r in rows:
        assert r.n_retries > 0
        assert r.amplification >= 0


def test_retry_success(spark):
    from kcore_spark.queries.extensions_r10dn import q_retry_success

    r = q_retry_success(spark, SF_DIR_MED).collect()[0]
    assert r.n_retries > 0
    assert 0.0 <= r.retry_success_rate <= 1.0
    assert 0.0 <= r.next_event_ok_rate <= 1.0


def test_thundering_herd(spark):
    from kcore_spark.queries.extensions_r10dn import q_thundering_herd

    rows = q_thundering_herd(spark, SF_DIR_MED).collect()
    for r in rows:
        assert r.n_err > r.threshold
        assert 1 <= r.n_users <= r.n_err

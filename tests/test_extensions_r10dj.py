"""Round-10 LLM-serving-planning block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_kv_budget(spark):
    from kcore_spark.queries.extensions_r10dj import q_kv_cache_budget

    rows = q_kv_cache_budget(spark, SF_DIR).collect()
    assert [r.gib for r in rows] == [8, 24, 80]
    for r in rows:
        assert r.p50 <= r.p90 <= r.max_len
        assert r.seqs_at_max <= r.seqs_at_p90 <= r.seqs_at_p50
    # more memory, more sequences
    s50 = [r.seqs_at_p50 for r in rows]
    assert s50 == sorted(s50)


def test_batch_tradeoff(spark):
    from kcore_spark.queries.extensions_r10dj import q_batch_latency_tradeoff

    rows = q_batch_latency_tradeoff(spark, SF_DIR).collect()
    assert [r.batch_size for r in rows] == [1, 4, 16, 64]
    lat = [r.mean_latency_ms for r in rows]
    thr = [r.requests_per_s for r in rows]
    assert lat == sorted(lat)  # bigger batches wait longer
    assert thr == sorted(thr)  # ...but serve more
    assert rows[0].fill_wait_ms == 0.0


def test_speculative_gain(spark):
    from kcore_spark.queries.extensions_r10dj import q_speculative_decode_gain

    rows = q_speculative_decode_gain(spark, SF_DIR).collect()
    assert [r.draft_len for r in rows] == [2, 4, 8]
    for r in rows:
        assert 0.0 < r.accept_rate < 1.0
        assert 1.0 <= r.expected_tokens_per_step <= r.draft_len + 1
    gains = [r.expected_tokens_per_step for r in rows]
    assert gains == sorted(gains)

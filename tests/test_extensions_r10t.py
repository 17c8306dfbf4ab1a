"""Round-10 pretraining-prep block II invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_span_plan_token_conservation(spark):
    """input + target = tokens + 2*spans (each span adds one sentinel
    to each side); masked <= 15% of tokens."""
    from kcore_spark.queries.extensions_r10t import q_span_corruption_plan

    rows = q_span_corruption_plan(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.input_tokens + r.target_tokens == r.tokens + 2 * r.n_spans
        assert r.masked_tokens <= r.tokens * 15 // 100 + r.n_docs  # per-doc floor
        assert r.n_spans <= r.masked_tokens


def test_oov_rate_bounds(spark):
    from kcore_spark.queries.extensions_r10t import q_tokenizer_oov_rate

    rows = q_tokenizer_oov_rate(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0 <= r.oov_rate <= 1

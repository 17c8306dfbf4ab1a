"""Round-10 concat-and-chunk prep block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_truncation_loss_monotone(spark):
    from kcore_spark.queries.extensions_r10dh import q_truncation_loss

    rows = q_truncation_loss(spark, SF_DIR).collect()
    assert [r.max_len for r in rows] == [512, 1024, 2048]
    losses = [r.loss_share for r in rows]
    assert losses == sorted(losses, reverse=True)  # longer cut, less loss
    for r in rows:
        assert r.n_truncated <= r.n_docs
        assert 0.0 <= r.loss_share <= 1.0


def test_boundary_stats(spark):
    from kcore_spark.queries.extensions_r10dh import (
        q_concat_boundary_stats,
        _doc_tokens,
    )
    import pyspark.sql.functions as F

    r = q_concat_boundary_stats(spark, SF_DIR).collect()[0]
    assert r.n_docs_split <= r.n_docs
    assert r.n_seqs_with_boundary <= r.n_sequences
    assert r.mean_docs_per_seq >= 1.0
    # sequence count equals ceil(total_tokens / 2048)
    tot = (
        _doc_tokens(spark, SF_DIR)
        .agg(F.sum("n_tok").alias("t"))
        .collect()[0]
        .t
    )
    assert r.n_sequences == -(-tot // 2048)


def test_attention_contamination(spark):
    from kcore_spark.queries.extensions_r10dh import q_attention_contamination

    r = q_attention_contamination(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.contamination_share <= 1.0
    assert r.cross_doc_pairs <= r.total_pairs

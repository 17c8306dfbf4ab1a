"""Round-10 physical-design advisor block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_encoding_advisor_recs(spark):
    """Low-NDV flags get dictionary; the unique string key gets plain."""
    from kcore_spark.queries.extensions_r10bo import q_encoding_advisor

    rows = {r.column_name: r for r in q_encoding_advisor(spark, SF_DIR).collect()}
    assert rows["l_returnflag"].recommendation == "dictionary"
    assert rows["l_linestatus"].recommendation == "dictionary"
    assert rows["l_orderkey_str"].recommendation in ("rle", "plain")
    for r in rows.values():
        assert 0 < r.ndv_ratio <= 1
        assert r.avg_width > 0


def test_bloom_advisor_monotone(spark):
    """Tighter FPP costs more bits and (weakly) more hashes."""
    from kcore_spark.queries.extensions_r10bo import q_bloom_size_advisor

    rows = q_bloom_size_advisor(spark, SF_DIR).collect()
    assert [r.fpp for r in rows] == [0.01, 0.001, 0.0001]
    bits = [r.bits for r in rows]
    assert bits == sorted(bits)
    hashes = [r.hashes for r in rows]
    assert hashes == sorted(hashes)
    assert all(r.hashes >= 1 for r in rows)


def test_sort_key_advisor_scores(spark):
    """Prune scores in [0,1]; random write order prunes ~nothing for
    uncorrelated columns (scores near 0)."""
    from kcore_spark.queries.extensions_r10bo import q_sort_key_advisor

    rows = q_sort_key_advisor(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_buckets == 32
        assert -0.01 <= r.prune_score <= 1

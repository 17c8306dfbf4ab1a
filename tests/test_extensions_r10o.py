"""Round-10 semantics-pin / capacity block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_null_safe_join_matches_unknown_bucket(spark):
    """The NULL bucket matches ONLY under null-safe equality; the
    non-null buckets agree between modes."""
    from kcore_spark.queries.extensions_r10o import q_null_safe_join

    rows = {r.bucket: r for r in q_null_safe_join(spark, SF_DIR).collect()}
    assert rows["bucket_unknown"].n_safe > 0
    assert rows["bucket_unknown"].n_plain == 0
    for b in ("bucket_0", "bucket_1", "bucket_2"):
        assert rows[b].n_safe == rows[b].n_plain > 0


def test_empty_agg_semantics(spark):
    from kcore_spark.queries.extensions_r10o import q_empty_agg_semantics

    rows = {r.input_kind: r for r in q_empty_agg_semantics(spark, SF_DIR).collect()}
    e, f = rows["empty"], rows["full"]
    assert e.cnt == 0
    assert e.sum_price is None and e.avg_price is None and e.min_key is None
    assert f.cnt > 0 and f.sum_price > 0 and f.avg_price > 0


def test_row_width_planner(spark):
    from kcore_spark.queries.extensions_r10o import q_row_width_planner

    rows = q_row_width_planner(spark, SF_DIR).collect()
    assert [r.table_name for r in rows] == ["documents", "embeddings", "events"]
    for r in rows:
        assert r.bytes_per_row > 0
        assert r.partitions_at_128mb >= 1
        # embeddings: 64 floats + ids = 268 bytes/row exactly
        if r.table_name == "embeddings":
            assert r.bytes_per_row == 64 * 4 + 12

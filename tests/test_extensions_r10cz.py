"""Round-10 incremental-view-maintenance-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_delta_join_identity(spark):
    from kcore_spark.queries.extensions_r10cz import q_delta_join_maintenance

    rows = q_delta_join_maintenance(spark, SF_DIR).collect()
    assert rows
    assert all(r.matches for r in rows)  # bilinear identity holds exactly


def test_topk_buffer(spark):
    from kcore_spark.queries.extensions_r10cz import q_topk_buffer_maintenance

    r = q_topk_buffer_maintenance(spark, SF_DIR).collect()[0]
    assert r.overlap <= 10
    # 2k buffer of an immutable base plus the full delta always suffices
    assert r.buffer_sufficient
    assert r.union_size == 10


def test_retraction_identity(spark):
    from kcore_spark.queries.extensions_r10cz import q_agg_retraction

    r = q_agg_retraction(spark, SF_DIR).collect()[0]
    assert r.matches
    assert r.n_maintained == r.n_recomputed
    assert abs(r.avg_maintained - r.avg_recomputed) < 1e-9

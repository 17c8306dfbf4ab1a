"""Structural invariants of the round-9 batch-W surfaces (cogroup
as-of, clustered write)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_cogroup_asof_matches_backward_asof_semantics(spark):
    """n_matched <= n_purchases; avg gap positive when matched; a user
    with zero views reports 0 matched and NULL gap."""
    from kcore_spark.queries.extensions_r9w import q_cogroup_asof

    rows = q_cogroup_asof(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_matched <= r.n_purchases
        if r.n_matched == 0:
            assert r.avg_gap_s is None
        else:
            assert r.avg_gap_s > 0


def test_clustered_write_per_file_ranges(spark):
    """The structural half the hash can't pin: per-file key ranges
    read back via _metadata are truly disjoint and near-balanced."""
    from pyspark.sql import functions as F

    from kcore_spark.queries.extensions_r9w import (
        _CW_BUCKETS,
        _CW_STAGED,
        q_clustered_write_audit,
    )

    r = q_clustered_write_audit(spark, SF_DIR).collect()[0]
    assert r.n_files == _CW_BUCKETS
    assert r.all_non_overlapping == 1
    files = (
        spark.read.parquet(_CW_STAGED[SF_DIR])
        .select("o_orderkey", F.col("_metadata.file_name").alias("f"))
        .groupBy("f")
        .agg(
            F.min("o_orderkey").alias("kmin"),
            F.max("o_orderkey").alias("kmax"),
            F.count(F.lit(1)).alias("rows"),
        )
        .orderBy("kmin")
        .collect()
    )
    assert len(files) == _CW_BUCKETS
    for a, b in zip(files, files[1:]):
        assert a.kmax < b.kmin
    sizes = [f.rows for f in files]
    assert max(sizes) < 2 * min(sizes)  # sampled boundaries stay near-balanced

"""Round-10 dedup-threshold-science block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_threshold_f1(spark):
    from kcore_spark.queries.extensions_r10dp import q_dedup_threshold_f1

    rows = q_dedup_threshold_f1(spark, SF_DIR).collect()
    assert [r.threshold for r in rows] == [0.7, 0.8, 0.9]
    recalls = [r.recall_in_block for r in rows]
    # raising the threshold can only lower recall
    assert recalls == sorted(recalls, reverse=True)
    for r in rows:
        assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.f1 <= 1.0


def test_split_stability(spark):
    from kcore_spark.queries.extensions_r10dp import q_threshold_split_stability

    r = q_threshold_split_stability(spark, SF_DIR).collect()[0]
    assert r.t_half0 in (0.7, 0.8, 0.9)
    assert r.t_half1 in (0.7, 0.8, 0.9)
    assert r.choice_stable == (r.t_half0 == r.t_half1)


def test_similarity_bins(spark):
    from kcore_spark.queries.extensions_r10dp import q_similarity_bin_precision

    rows = q_similarity_bin_precision(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.pair_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 <= r.bin <= 4
        assert 0.0 <= r.p_same_label <= 1.0

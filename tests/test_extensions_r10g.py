"""Round-10 ops-planning block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_partition_balance_bounds(spark):
    from kcore_spark.queries.extensions_r10g import q_partition_balance

    r = q_partition_balance(spark, SF_DIR).collect()[0]
    assert r.n_buckets == 32
    assert r.min_bucket <= r.total_rows / 32 <= r.max_bucket
    assert r.min_over_mean <= 1.0 <= r.max_over_mean


def test_sample_size_power_formula(spark):
    """Required sample is maximized at p=0.5 (<= 2401 for 2%/95%)."""
    from kcore_spark.queries.extensions_r10g import q_sample_size_power

    rows = q_sample_size_power(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.conversion_rate <= 1
        assert 0 <= r.required_sample <= 2401


def test_join_cardinality_prediction_exact(spark):
    from kcore_spark.queries.extensions_r10g import q_join_cardinality_estimate

    r = q_join_cardinality_estimate(spark, SF_DIR).collect()[0]
    assert r.prediction_exact is True
    assert r.predicted_rows == r.actual_rows > 0


def test_skew_plan_single_row(spark):
    from kcore_spark.queries.extensions_r10g import q_skew_salting_plan

    r = q_skew_salting_plan(spark, SF_DIR).collect()[0]
    assert r.n_keys > 0
    assert 0 <= r.n_skewed_keys <= r.n_keys
    assert r.max_fanout >= 1
    assert r.heaviest_count >= 1

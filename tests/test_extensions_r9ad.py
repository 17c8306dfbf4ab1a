"""Column-profile and sampled-estimator invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_column_profile_consistency(spark):
    """Keys are unique (distinct == rows, top share == 1/n); no nulls
    in the fixture; every profiled column appears."""
    from kcore_spark.queries.extensions_r9ad import _PROFILE_COLS, q_column_profile

    rows = {r.column_name: r for r in q_column_profile(spark, SF_DIR).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    k = rows["o_orderkey"]
    assert k.n_distinct == k.n_rows and k.n_null == 0
    assert abs(k.top_share - 1.0 / k.n_rows) < 1e-6  # 6dp round
    s = rows["o_orderstatus"]
    assert s.n_distinct < 10 and s.top_share > 0.1


def test_sample_estimator_within_sampling_error(spark):
    """The rate²-scaled estimate lands within a loose band of the
    exact pair count (binomial sampling error at fixture size)."""
    from kcore_spark.queries.extensions_r9ad import q_sample_pair_estimate

    r = q_sample_pair_estimate(spark, SF_DIR).collect()[0]
    assert r.exact_pairs > 0
    assert r.sample_pairs <= r.exact_pairs
    assert 0.3 * r.exact_pairs <= r.estimated_pairs <= 3.0 * r.exact_pairs

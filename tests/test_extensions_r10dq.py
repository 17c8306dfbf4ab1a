"""Round-10 percentile-semantics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_percent_rank_cume(spark):
    from kcore_spark.queries.extensions_r10dq import q_percent_rank_cume_dist

    rows = q_percent_rank_cume_dist(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        assert 1 <= r.quartile <= 4
        # cume_dist strictly dominates percent_rank
        assert r.cume >= r.pct_rank


def test_percentile_cont_disc(spark):
    from kcore_spark.queries.extensions_r10dq import q_percentile_cont_disc

    rows = q_percentile_cont_disc(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.q1_cont <= r.median_cont <= r.q3_cont
        # disc median is a witness value near the interpolated one
        assert abs(r.median_disc - r.median_cont) <= r.q3_cont - r.q1_cont


def test_rolling_median(spark):
    from kcore_spark.queries.extensions_r10dq import q_rolling_median_window

    rows = q_rolling_median_window(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.rolling_median_7 > 0

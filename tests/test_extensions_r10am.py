"""Round-10 ratio-metric experimentation block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_delta_method_two_arms(spark):
    """A/A-style split: similar ratios, positive finite SEs."""
    from kcore_spark.queries.extensions_r10am import q_delta_method_ratio

    rows = q_delta_method_ratio(spark, SF_DIR).collect()
    assert [r.arm for r in rows] == ["A", "B"]
    for r in rows:
        assert r.n > 50
        assert r.ratio > 0
        assert 0 < r.se_delta < r.ratio  # SE well below the mean
    ra, rb = rows[0].ratio, rows[1].ratio
    assert abs(ra - rb) / max(ra, rb) < 0.2  # null split, close ratios


def test_post_stratification_near_raw(spark):
    """Null split: post-stratified mean close to raw mean (small
    reweighting correction), both positive."""
    from kcore_spark.queries.extensions_r10am import q_post_stratification

    rows = q_post_stratification(spark, SF_DIR).collect()
    assert [r.arm for r in rows] == ["A", "B"]
    for r in rows:
        assert r.raw_mean > 0
        assert abs(r.post_strat_mean - r.raw_mean) / r.raw_mean < 0.1


def test_bayes_prob_sane(spark):
    """Probability in (0,1); posterior means match s/n roughly; a
    null split keeps the probability away from certainty."""
    from kcore_spark.queries.extensions_r10am import q_bayes_prob_best

    r = q_bayes_prob_best(spark, SF_DIR).collect()[0]
    assert r.n_a > 50 and r.n_b > 50
    assert 0 < r.post_mean_a < 1 and 0 < r.post_mean_b < 1
    assert 0.001 < r.p_b_beats_a < 0.999

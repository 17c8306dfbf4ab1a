"""Round-10 population/richness-estimator block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_capture_recapture(spark):
    from kcore_spark.queries.extensions_r10co import q_capture_recapture

    r = q_capture_recapture(spark, SF_DIR).collect()[0]
    assert r.recaptured <= min(r.n1, r.n2)
    # Chapman never estimates below the union lower bound components
    assert r.chapman_estimate >= max(r.n1, r.n2) - 1
    # fixture users are highly active, so both halves see nearly all:
    # the estimate should land close to the truth
    assert 0.8 <= r.ratio_to_truth <= 1.2


def test_chao1(spark):
    from kcore_spark.queries.extensions_r10co import q_chao1_richness

    r = q_chao1_richness(spark, SF_DIR).collect()[0]
    assert r.chao1 >= r.s_obs
    assert 0.0 < r.coverage_of_richness <= 1.0


def test_good_turing(spark):
    from kcore_spark.queries.extensions_r10co import q_good_turing_mass

    r = q_good_turing_mass(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.missing_mass_p0 <= 1.0
    assert 0.0 <= r.singleton_share <= 1.0
    assert r.gt_singleton_prob >= 0.0

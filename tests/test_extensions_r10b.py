"""Round-10 experimentation-block invariants: Holm vs BH dominance,
effect-size identities, Cochran degrees, SRM bounds."""

from __future__ import annotations

from .conftest import SF_DIR


def test_holm_is_subset_of_bh_catalog(spark):
    """Holm (FWER at 0.05) is never more liberal than BH (FDR at 0.10)
    on the same catalog; rejections form a prefix of the p-order."""
    from kcore_spark.queries.extensions_r8g_stats import q_bh_fdr
    from kcore_spark.queries.extensions_r10b import q_holm_bonferroni

    holm = q_holm_bonferroni(spark, SF_DIR).collect()
    bh = {r.n_name for r in q_bh_fdr(spark, SF_DIR).collect()}
    assert {r.n_name for r in holm} <= bh
    ranks = [r.i for r in holm]
    assert ranks == list(range(1, len(ranks) + 1))  # prefix property
    for r in holm:
        assert r.holm_adj_p <= 1.0


def test_cohens_d_hedges_shrinks(spark):
    """|g| < |d| (the small-sample correction shrinks), pooled SD > 0."""
    from kcore_spark.queries.extensions_r10b import q_cohens_d

    r = q_cohens_d(spark, SF_DIR).collect()[0]
    assert r.n0 > 0 and r.n1 > 0
    assert r.pooled_sd > 0
    assert abs(r.hedges_g) <= abs(r.cohens_d)


def test_cochran_q_nonnegative(spark):
    from kcore_spark.queries.extensions_r10b import q_cochran_q

    r = q_cochran_q(spark, SF_DIR).collect()[0]
    assert r.n_subjects > 0
    assert r.cochran_q >= 0
    for c in ("n_view", "n_click", "n_purchase"):
        assert 0 <= getattr(r, c) <= r.n_subjects


def test_srm_covers_all_segments(spark):
    from kcore_spark.queries.extensions_r10b import q_srm_check

    rows = q_srm_check(spark, SF_DIR).collect()
    assert len(rows) == 5  # TPC-H market segments
    for r in rows:
        assert r.srm_chi2 >= 0
        # a healthy md5 split must not trip the 0.001-level alarm
        assert r.srm_flag is False

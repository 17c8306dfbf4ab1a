"""Structural invariants of the round-9 batch-G additions
(classification report, average precision, Kruskal-Wallis, Spearman)
— the properties a single-fixture hash match cannot pin by itself."""

from __future__ import annotations

from .conftest import SF_DIR


def test_classification_report_identities(spark):
    """Micro precision = recall = F1 (single-label); per-class F1 lies
    between min and max of (P, R); macro/micro support equals the sum
    of per-class supports; the pinned 4-in-5 corruptor puts every
    per-class recall near 0.8."""
    from kcore_spark.queries.extensions_r9g import q_classification_report

    rows = {r.cls: r for r in q_classification_report(spark, SF_DIR).collect()}
    micro = rows.pop("__micro__")
    macro = rows.pop("__macro__")
    assert micro.precision == micro.recall == micro.f1
    assert micro.support == macro.support == sum(r.support for r in rows.values())
    for r in rows.values():
        lo, hi = sorted((r.precision, r.recall))
        assert lo - 1e-9 <= r.f1 <= hi + 1e-9
        assert 0.5 < r.recall < 1.0  # 80% keep-rate, hash noise aside
    assert abs(micro.recall - 0.8) < 0.05


def test_pr_auc_beats_prevalence(spark):
    """With the +0.7 positive-label lift the scorer is informative:
    AP must exceed the positive prevalence (the AP of a random
    ranking) and stay within (0, 1]."""
    from kcore_spark.queries.extensions_r9g import q_pr_auc

    r = q_pr_auc(spark, SF_DIR).collect()[0]
    prevalence = r.n_pos / r.n
    assert 0.0 < r.avg_precision <= 1.0
    assert r.avg_precision > prevalence + 0.05


def test_kruskal_wallis_bounds(spark):
    """H >= 0; the tie correction divides by C <= 1 so the corrected
    statistic is >= the raw one; priorities give k = 5 groups."""
    from kcore_spark.queries.extensions_r9g import q_kruskal_wallis

    r = q_kruskal_wallis(spark, SF_DIR).collect()[0]
    assert r.k_groups == 5
    assert r.h_stat >= 0.0
    assert r.h_tie_corrected >= r.h_stat - 1e-9


def test_spearman_matches_pandas(spark):
    """|rho| <= 1, and the tie-averaged mid-rank machinery agrees with
    pandas' spearman on the same columns to 1e-6 (third engine)."""
    import pandas as pd

    from kcore_spark.queries.extensions_r9g import q_spearman_corr

    r = q_spearman_corr(spark, SF_DIR).collect()[0]
    assert -1.0 <= r.spearman_rho <= 1.0
    import duckdb

    pdf = duckdb.sql(
        f"SELECT l_quantity, l_extendedprice FROM '{SF_DIR}/lineitem.parquet'"
    ).df()
    # pandas' method="spearman" needs scipy (absent): rank explicitly
    # with tie-averaged mid-ranks, then plain Pearson — same estimator
    ref = (
        pdf["l_quantity"].rank(method="average")
        .corr(pdf["l_extendedprice"].rank(method="average"))
    )
    assert abs(r.spearman_rho - ref) < 1e-6
    assert r.n == len(pdf)

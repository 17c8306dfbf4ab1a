"""Round-10 pattern-detection block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_periodogram_shape(spark):
    """6 period rows, non-negative power."""
    from kcore_spark.queries.extensions_r10bc import q_periodogram

    rows = q_periodogram(spark, SF_DIR).collect()
    assert [r.period_days for r in rows] == [3.5, 7.0, 14.0, 30.0, 91.0, 365.0]
    assert all(r.power >= 0 for r in rows)


def test_lof_top_outliers(spark):
    """Top-10 LOF scores, descending, all >= ~1 territory (the max
    must exceed the inlier baseline of 1)."""
    from kcore_spark.queries.extensions_r10bc import q_lof_scores

    rows = q_lof_scores(spark, SF_DIR).collect()
    assert len(rows) == 10
    lofs = [r.lof for r in rows]
    assert lofs == sorted(lofs, reverse=True)
    assert lofs[0] > 1.0
    assert all(l > 0 for l in lofs)


def test_event_trigrams(spark):
    """10 trigram rows with positive counts, descending."""
    from kcore_spark.queries.extensions_r10bc import q_event_trigram_patterns

    rows = q_event_trigram_patterns(spark, SF_DIR).collect()
    assert len(rows) == 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(n > 0 for n in ns)

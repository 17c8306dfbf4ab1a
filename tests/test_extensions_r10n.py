"""Round-10 calendar-profile / dedup-audit block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_weekday_effect_full_week(spark):
    from kcore_spark.queries.extensions_r10n import q_weekday_effect

    rows = q_weekday_effect(spark, SF_DIR).collect()
    assert [r.iso_dow for r in rows] == list(range(1, 8))
    assert abs(sum(r.dow_index for r in rows) / 7 - 1.0) < 1e-4


def test_hour_profile_full_day(spark):
    from kcore_spark.queries.extensions_r10n import q_hour_of_day_profile

    rows = q_hour_of_day_profile(spark, SF_DIR).collect()
    assert [r.hour for r in rows] == list(range(24))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert rows[0].peak_to_trough >= 1


def test_dup_families_cover_corpus(spark):
    from kcore_spark.queries.extensions_r10n import q_dup_cluster_sizes

    rows = q_dup_cluster_sizes(spark, SF_DIR).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs > 0
    for r in rows:
        assert r.n_docs == r.family_size * r.n_families
        assert r.removable_docs == (r.family_size - 1) * r.n_families

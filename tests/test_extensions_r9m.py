"""Structural invariants of the round-9 batch-M additions (nearest
temporal join, parse_url, Box-Cox)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_nearest_gap_never_exceeds_backward_asof(spark):
    """The bidirectional nearest gap is by definition <= the backward
    as-of gap for every user that has a backward match; per-user min
    gaps are non-negative."""
    from kcore_spark.queries.extensions_r9m import q_nearest_event_join

    rows = q_nearest_event_join(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_gap_s >= 0
        assert r.avg_gap_s >= r.min_gap_s


def test_url_parse_roundtrip(spark):
    """Every synthesized host ends with .example.com and lang params
    cover the corpus langs exactly (parse_url must not mangle them)."""
    import duckdb

    from kcore_spark.queries.extensions_r9m import q_url_funcs

    rows = q_url_funcs(spark, SF_DIR).collect()
    assert rows
    langs = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT lang FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    assert {r.lang_param for r in rows} == langs
    for r in rows:
        assert r.host.endswith(".example.com")
        assert r.n > 0


def test_box_cox_grid_and_single_best(spark):
    """Five λ rows, exactly one argmax, and LL(λ=1) (identity) must
    not beat every other λ by construction of a right-skewed metric —
    i.e. the best λ is <= 1 for positive skew (log-ish transforms
    win)."""
    from kcore_spark.queries.extensions_r9m import q_box_cox

    rows = q_box_cox(spark, SF_DIR).collect()
    assert len(rows) == 5
    best = [r for r in rows if r.is_best == 1]
    assert len(best) == 1
    assert best[0].lam <= 1.0

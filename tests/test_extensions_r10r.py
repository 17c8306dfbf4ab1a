"""Round-10 readability-family completion invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_fog_positive(spark):
    from kcore_spark.queries.extensions_r10r import q_gunning_fog

    rows = q_gunning_fog(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.avg_fog > 0  # fog is positive for any non-empty text


def test_ari_and_cli_consistent_shapes(spark):
    """Same source partition across all three formulas; per-source doc
    counts agree with fog's."""
    from kcore_spark.queries.extensions_r10r import (
        q_ari,
        q_coleman_liau,
        q_gunning_fog,
    )

    fog = {r.source: r.n_docs for r in q_gunning_fog(spark, SF_DIR).collect()}
    ari = {r.source: r.n_docs for r in q_ari(spark, SF_DIR).collect()}
    cli = {r.source: r.n_docs for r in q_coleman_liau(spark, SF_DIR).collect()}
    assert fog == ari == cli

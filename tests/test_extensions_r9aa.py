"""Padding-waste invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_padding_waste_monotone_in_bucket(spark):
    """Bigger buckets can only waste more (ceil to a coarser grid);
    padded >= real always; waste in [0, 1)."""
    from kcore_spark.queries.extensions_r9aa import q_padding_waste

    rows = sorted(q_padding_waste(spark, SF_DIR).collect(), key=lambda r: r.bucket)
    assert len(rows) == 4
    for r in rows:
        assert r.padded_tokens >= r.real_tokens
        assert 0.0 <= r.waste_ratio < 1.0
    wastes = [r.waste_ratio for r in rows]
    assert wastes == sorted(wastes)

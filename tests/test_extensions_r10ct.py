"""Round-10 bit/format surface block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bitwise_aggregates(spark):
    from kcore_spark.queries.extensions_r10ct import q_bitwise_aggregates

    rows = q_bitwise_aggregates(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # AND result is a subset of the OR result's bits
        assert r.all_bits & r.any_bits == r.all_bits
        assert 0 <= r.any_bits < 4096
        assert r.total_pop >= 0


def test_bit_shift_identities(spark):
    from kcore_spark.queries.extensions_r10ct import q_bit_shift_family

    rows = q_bit_shift_family(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.shl3 == r.k << 3
        assert r.shr2 == r.k >> 2
        assert r.low8 == r.k & 255
        assert r.with_bit12 & 4096 == 4096
        assert 0 <= r.pop8 <= 8


def test_format_strings(spark):
    from kcore_spark.queries.extensions_r10ct import q_format_strings

    rows = q_format_strings(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(r.padded) >= 8 and r.padded.endswith(str(r.k))
        assert int(r.hex_lower, 16) == r.k
        assert r.label.startswith("ORD-")
        assert len(r.starred) == 12
        assert r.rep in ("ab", "abab", "ababab")

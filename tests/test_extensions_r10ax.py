"""Round-10 scalar-surface completion invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_regexp_position_consistency(spark):
    """Position 0 iff no match; extracted text sits at the position."""
    from kcore_spark.queries.extensions_r10ax import q_regexp_instr_substr

    rows = q_regexp_instr_substr(spark, SF_DIR).collect()
    assert len(rows) > 100
    for r in rows:
        if r.vowel_pair is None:
            assert r.vowel_pair_pos == 0
        else:
            assert r.vowel_pair_pos >= 1
            assert len(r.vowel_pair) == 2


def test_months_between_sign(spark):
    """Fractional months share the sign of the ship-order gap; next
    Monday within 7 days after the order date."""
    from kcore_spark.queries.extensions_r10ax import q_months_between_family

    rows = q_months_between_family(spark, SF_DIR).collect()
    assert len(rows) > 50
    for r in rows:
        assert r.next_monday_epoch > r.month_start_epoch
        assert abs(r.months_to_ship) < 120


def test_string_builtins_roundtrip(spark):
    """base64 roundtrip is lossless; accented suffix adds 2 bytes but
    1 char; initcap starts words uppercase."""
    from kcore_spark.queries.extensions_r10ax import q_string_builtins2

    rows = q_string_builtins2(spark, SF_DIR).collect()
    assert len(rows) > 100
    for r in rows:
        assert r.bytes_accented == r.chars_accented + 1
        assert r.title_name[0].isupper()
        assert len(r.l3) == 3 and len(r.r3) == 3

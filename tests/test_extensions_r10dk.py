"""Round-10 dialect-semantics-pin block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_division_modulo(spark):
    from kcore_spark.queries.extensions_r10dk import q_division_modulo_pins

    rows = q_division_modulo_pins(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # trunc-div identity: x = int_div * y + mod
        assert r.x == r.int_div * r.y + r.mod_dividend_sign
        # floor_div <= int_div (they differ only on negative quotients)
        assert r.floor_div <= r.int_div
        if r.mod_dividend_sign != 0:
            assert (r.mod_dividend_sign > 0) == (r.x > 0)


def test_cast_matrix(spark):
    from kcore_spark.queries.extensions_r10dk import q_cast_matrix

    rows = q_cast_matrix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.floor_i <= r.cast_trunc <= r.ceil_i
        assert abs(r.cast_trunc) <= abs(r.d) + 1
        assert r.bad_cast_null is None
        assert r.str_to_int == r.k % 997


def test_date_edges(spark):
    from kcore_spark.queries.extensions_r10dk import q_date_edge_pins

    rows = q_date_edge_pins(spark, SF_DIR).collect()
    assert rows
    day = 86400
    for r in rows:
        assert 0 <= r.days_to_eom <= 30
        assert r.eom_epoch == r.d_epoch + r.days_to_eom * day
        assert r.eom_plus_30d == r.eom_epoch + 30 * day
        assert r.next_monday == r.week_monday + 7 * day
        assert r.week_monday <= r.d_epoch

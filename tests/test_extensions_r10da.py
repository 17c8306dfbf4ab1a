"""Round-10 apportionment block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def _check_total(rows, seats=64):
    assert sum(r.seats for r in rows) == seats
    for r in rows:
        assert r.seats >= 0
        # no method strays absurdly far from the ideal share
        assert abs(r.seats - r.ideal_seats) < 5


def test_dhondt(spark):
    from kcore_spark.queries.extensions_r10da import q_dhondt_allocation

    _check_total(q_dhondt_allocation(spark, SF_DIR).collect())


def test_sainte_lague(spark):
    from kcore_spark.queries.extensions_r10da import q_sainte_lague_allocation

    _check_total(q_sainte_lague_allocation(spark, SF_DIR).collect())


def test_hamilton_quota(spark):
    from kcore_spark.queries.extensions_r10da import q_hamilton_allocation

    rows = q_hamilton_allocation(spark, SF_DIR).collect()
    _check_total(rows)
    # Hamilton satisfies quota: seats within 1 of the exact quota
    for r in rows:
        assert abs(r.seats - r.ideal_seats) <= 1.0

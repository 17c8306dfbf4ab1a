"""Round-10 index-number-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_chained_index(spark):
    from kcore_spark.queries.extensions_r10cq import q_chained_index

    r = q_chained_index(spark, SF_DIR).collect()[0]
    assert r.link_95_96 > 0 and r.link_96_97 > 0
    assert math.isclose(
        r.chained_laspeyres, r.link_95_96 * r.link_96_97, rel_tol=1e-4
    )
    assert abs(r.chain_drift) < 2.0  # sane drift


def test_uvi_decomposition(spark):
    from kcore_spark.queries.extensions_r10cq import q_unit_value_index

    r = q_unit_value_index(spark, SF_DIR).collect()[0]
    assert r.n_parts > 10
    assert math.isclose(
        r.unit_value_index, r.laspeyres_price * r.mix_effect, rel_tol=1e-4
    )


def test_bortkiewicz_identity(spark):
    from kcore_spark.queries.extensions_r10cq import q_bortkiewicz

    r = q_bortkiewicz(spark, SF_DIR).collect()[0]
    # the identity holds to rounding
    assert abs(r.identity_residual) < 1e-4
    assert r.laspeyres_p > 0 and r.laspeyres_q > 0

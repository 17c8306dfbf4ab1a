"""Round-10 SPC block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_xbar_limits_bracket_center(spark):
    from kcore_spark.queries.extensions_r10ac import q_xbar_control_chart

    r = q_xbar_control_chart(spark, SF_DIR).collect()[0]
    assert r.lcl < r.center_line < r.ucl
    assert 0 <= r.n_out_of_control <= r.n_days


def test_cpk_le_cp(spark):
    """Cpk <= Cp always (centering can only hurt capability)."""
    from kcore_spark.queries.extensions_r10ac import q_process_capability

    r = q_process_capability(spark, SF_DIR).collect()[0]
    assert r.sd > 0
    assert r.cpk <= r.cp + 1e-9
    assert 0 <= r.out_of_spec_share <= 1

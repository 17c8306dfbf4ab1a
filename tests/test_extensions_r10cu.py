"""Round-10 supply-chain-II block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bullwhip_positive(spark):
    from kcore_spark.queries.extensions_r10cu import q_bullwhip_effect

    r = q_bullwhip_effect(spark, SF_DIR).collect()[0]
    assert r.cv_demand > 0 and r.cv_supply > 0
    assert r.bullwhip_ratio > 0


def test_abc_xyz_matrix(spark):
    from kcore_spark.queries.extensions_r10cu import q_abc_xyz_matrix

    rows = q_abc_xyz_matrix(spark, SF_DIR).collect()
    assert rows
    abcs = {r.abc for r in rows}
    xyzs = {r.xyz for r in rows}
    assert abcs <= {"A", "B", "C"} and xyzs <= {"X", "Y", "Z"}
    assert all(r.n_parts > 0 and r.revenue > 0 for r in rows)


def test_demand_pooling_reduces_cv(spark):
    from kcore_spark.queries.extensions_r10cu import q_demand_pooling

    r = q_demand_pooling(spark, SF_DIR).collect()[0]
    assert r.n_regions == 5
    # pooling can't increase CV in aggregate (sub-additivity of sd)
    assert r.pooled_cv <= r.avg_region_cv + 1e-9
    assert 0.0 <= r.cv_reduction <= 1.0

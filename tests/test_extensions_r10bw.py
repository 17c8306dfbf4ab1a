"""Round-10 variance-homogeneity-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_bartlett_bounds(spark):
    from kcore_spark.queries.extensions_r10bw import q_bartlett_test

    r = q_bartlett_test(spark, SF_DIR).collect()[0]
    assert r.k == 5 and r.df == 4
    assert r.pooled_var > 0
    assert r.chi2_bartlett >= 0


def test_conover_bounds(spark):
    from kcore_spark.queries.extensions_r10bw import q_conover_squared_ranks

    r = q_conover_squared_ranks(spark, SF_DIR).collect()[0]
    assert r.k == 5 and r.df == 4
    assert math.isfinite(r.t_conover) and r.t_conover >= 0


def test_cochran_c_bounds(spark):
    from kcore_spark.queries.extensions_r10bw import q_cochran_c

    r = q_cochran_c(spark, SF_DIR).collect()[0]
    assert r.k == 5
    # C in [1/k, 1]; Fmax >= 1
    assert 1.0 / 5 - 1e-9 <= r.cochran_c <= 1.0
    assert r.hartley_fmax >= 1.0
    assert r.max_group

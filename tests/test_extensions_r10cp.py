"""Round-10 spatial-statistics-II block invariants."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_morans_i_bounds(spark):
    from kcore_spark.queries.extensions_r10cp import q_morans_i

    r = q_morans_i(spark, SF_DIR).collect()[0]
    assert r.n_cells == 72
    # rook links on a 12x6 grid: 2*(11*6 + 12*5) = 252 directed
    assert r.n_links == 252
    assert -1.5 <= r.morans_i <= 1.5
    assert r.expected_i < 0


def test_ripley_monotone(spark):
    from kcore_spark.queries.extensions_r10cp import q_ripley_k

    rows = q_ripley_k(spark, SF_DIR).collect()
    assert [r.radius for r in rows] == [5.0, 10.0, 20.0]
    ks = [r.k_hat for r in rows]
    assert ks == sorted(ks)  # K is non-decreasing in r
    for r in rows:
        assert r.k_hat >= 0
        # md5-uniform points should be near CSR
        assert 0.3 <= r.clustering_ratio <= 3.0


def test_clark_evans_near_csr(spark):
    from kcore_spark.queries.extensions_r10cp import q_clark_evans

    r = q_clark_evans(spark, SF_DIR).collect()[0]
    assert r.mean_nn_dist > 0
    # uniform points: R should be near 1
    assert 0.5 <= r.clark_evans_r <= 1.5
    assert math.isfinite(r.z_score)

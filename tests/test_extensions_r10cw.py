"""Round-10 queueing-III block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_erlang_b(spark):
    from kcore_spark.queries.extensions_r10cw import q_erlang_b_loss

    rows = q_erlang_b_loss(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.trunks <= 10
        assert 0.0 <= r.p_block <= 0.02


def test_mmc_tail(spark):
    from kcore_spark.queries.extensions_r10cw import q_mmc_wait_tail

    rows = q_mmc_wait_tail(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.servers >= 1
        assert 0.0 <= r.p_wait <= 1.0
        # the tail is a sub-event of waiting at all
        assert r.p_wait_gt_3min <= r.p_wait + 1e-9


def test_pk_wait(spark):
    from kcore_spark.queries.extensions_r10cw import q_pollaczek_khinchine

    r = q_pollaczek_khinchine(spark, SF_DIR).collect()[0]
    assert r.mean_service_days > 0
    assert r.service_cv2 >= 0
    # PK with CV^2 > 1 waits LONGER than M/M/1; with CV^2 < 1 shorter —
    # the ratio must equal (1 + cv2) / 2
    ratio = r.pk_mean_wait_days / r.mm1_wait_days
    assert abs(ratio - (1 + r.service_cv2) / 2) < 0.01

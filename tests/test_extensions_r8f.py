"""Round-8f extension operators: MMR preferring a diverse candidate
over a near-duplicate, bootstrap CI collapsing on degenerate data,
and DiD recovering an exact injected treatment effect."""

from __future__ import annotations

import datetime

import pytest


def test_mmr_prefers_diverse_over_near_duplicate(spark, tmp_path):
    """Query [1,0,0,0]. A and its near-copy B lead on relevance; C is
    slightly less relevant but diverse. Greedy MMR (lambda=0.7) must
    pick A, then C (diversity beats B's relevance), then B."""
    from kcore_spark.queries.extensions_r8f import q_mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),       # query
        (1, [0.91, 0.41, 0.0, 0.0], 0),     # A: top relevance
        (2, [0.89, 0.42, 0.0, 0.0], 0),     # B: near-duplicate of A, lower rel
        (3, [0.9, 0.0, 0.43, 0.0], 1),      # C: diverse, high relevance
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = [r["vec_id"] for r in q_mmr_rerank(spark, str(tmp_path)).collect()]
    assert out[:3] == [1, 3, 2]


def test_bootstrap_ci_collapses_on_constant_data(spark, tmp_path):
    """Every customer spends exactly 100.00: every replica mean is
    10000 cents regardless of weights, so the CI is a point."""
    from kcore_spark.queries.extensions_r8f import q_bootstrap_ci

    orders = [
        (k, 1 + k, "F", 100.0, datetime.datetime(2024, 1, 1), "x") for k in range(60)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = q_bootstrap_ci(spark, str(tmp_path)).first()
    assert row["point_mean"] == 10000.0
    assert row["ci_lo"] == row["ci_hi"] == row["boot_median"] == 10000.0


def test_did_recovers_injected_effect(spark, tmp_path):
    """Control emits value 1 in both halves; treatment emits 1 pre and
    6 post → DiD estimate exactly 5."""
    from kcore_spark.queries.extensions_r8f import q_diff_in_diff

    rows = []
    eid = 0
    for day in (1, 20):  # pre (day 1) and post (day 20) of a 21-day window
        for uid in range(8):
            treat = uid % 2 == 1
            val = 6.0 if (treat and day == 20) else 1.0
            rows.append(
                (eid, datetime.datetime(2024, 1, day), uid, "t", val, "{}")
            )
            eid += 1
    # pin the window so the midpoint cutoff falls between the days
    rows.append((eid, datetime.datetime(2024, 1, 21), 0, "t", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = q_diff_in_diff(spark, str(tmp_path)).first()
    assert row["treat_pre"] == 1.0 and row["control_pre"] == 1.0
    assert row["treat_post"] == 6.0
    assert row["did_estimate"] == pytest.approx(5.0, abs=1e-8)


def test_skyline_hand_computable(spark, tmp_path):
    """Points (price, date): (1,Jan1), (2,Jan5), (3,Jan3), (5,Jan9).
    (3,Jan3) is dominated by (2,Jan5) — cheaper AND more recent;
    everything else is on the frontier."""
    import datetime as dt

    from kcore_spark.queries.extensions_r8f import q_skyline_orders

    rows = [
        (1, 1, "F", 1.0, dt.datetime(2024, 1, 1), "x"),
        (2, 1, "F", 2.0, dt.datetime(2024, 1, 5), "x"),
        (3, 1, "F", 3.0, dt.datetime(2024, 1, 3), "x"),
        (4, 1, "F", 5.0, dt.datetime(2024, 1, 9), "x"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = [r["o_orderkey"] for r in q_skyline_orders(spark, str(tmp_path)).collect()]
    assert got == [1, 2, 4]

"""Round-8d extension operators: invariants the sf0.01 oracle parity
can't see — HITS on a hand-computable bipartite graph, MASE = 0 for a
perfectly periodic series, assortativity = 1 for degree-matched
blocks, and hard-negative mining skipping same-label neighbors."""

from __future__ import annotations

import datetime

import pytest


ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)
LI_SCHEMA = "l_orderkey long, l_partkey long"


def _write_graph(spark, tmp_path, orders, lines):
    spark.createDataFrame(
        [(ok, ck, "F", 1.0, datetime.datetime(2024, 1, 1), "x") for ok, ck in orders],
        ORDERS_SCHEMA,
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    # lineitem fixture needs only the two join columns; pad the schema
    # the loader prunes anyway
    spark.createDataFrame(lines, LI_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )


# ------------------------------------------------------------ HITS


def test_hits_hand_computable(spark, tmp_path):
    """Edges c1→{p1,p2}, c2→{p1} (w=1): a1=(2,1), h1=(c1:3, c2:2),
    a2=(p1:5, p2:3) → authorities 1.0 and 0.6."""
    from kcore_spark.queries.extensions_r8d import q_hits_ranking

    _write_graph(spark, tmp_path, [(1, 1), (2, 2)], [(1, 1), (1, 2), (2, 1)])
    out = [(r["p"], r["a2"], r["authority"]) for r in q_hits_ranking(spark, str(tmp_path)).collect()]
    assert out == [(1, 5, 1.0), (2, 3, 0.6)]


# ------------------------------------------------------------ MASE


def test_mase_zero_for_weekly_periodic_series(spark, tmp_path):
    """Daily values repeat with period 7 → the seasonal-naive error is
    exactly zero while the one-step naive error is not → MASE == 0."""
    from kcore_spark.queries.extensions_r8d import q_seasonal_mase

    rows = []
    eid = 0
    for day in range(21):
        val = float(10 + (day % 7))  # periodic with period 7, varies day-to-day
        rows.append(
            (eid, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day), 1, "t", val, "{}")
        )
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = q_seasonal_mase(spark, str(tmp_path)).first()
    assert row["n_days"] == 14  # days 8..21 have both lags
    assert row["mae_seasonal"] == 0.0
    assert row["mae_naive"] > 0
    assert row["mase"] == 0.0


# -------------------------------------------------- assortativity


def test_assortativity_one_for_degree_matched_blocks(spark, tmp_path):
    """Disjoint complete bipartite blocks 1x1 and 2x2: every edge has
    x == y, so the degree-degree correlation is exactly 1."""
    from kcore_spark.queries.extensions_r8d import q_degree_assortativity

    orders = [(1, 1), (2, 2), (3, 3)]
    lines = [
        (1, 10),  # block A: c1-p10 (degrees 1,1)
        (2, 20), (2, 21),  # block B: c2,c3 x p20,p21 (degrees 2,2)
        (3, 20), (3, 21),
    ]
    _write_graph(spark, tmp_path, orders, lines)
    row = q_degree_assortativity(spark, str(tmp_path)).first()
    assert row["n_edges"] == 5
    assert row["assortativity"] == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------- hard negatives


def test_hard_negative_skips_same_label_neighbor(spark, tmp_path):
    """Anchor 0 (label 0): its nearest vector is id 1 with the SAME
    label (excluded); the mined negative must be id 2 (label 1)."""
    from kcore_spark.queries.extensions_r8d import q_hard_negatives

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near_same = [0.999] + [0.01] + [0.0] * (dim - 2)
    near_diff = [0.9] + [0.1] + [0.0] * (dim - 2)
    far_diff = [0.0] * (dim - 1) + [1.0]
    rows = [
        (0, base, 0),
        (1, near_same, 0),
        (2, near_diff, 1),
        (3, far_diff, 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["q_id"]: r for r in q_hard_negatives(spark, str(tmp_path)).collect()}
    assert out[0]["neg_id"] == 2 and out[0]["neg_label"] == 1
    assert out[0]["cos"] > 0.9
    # anchor 2 (label 1): nearest different-label is id 1 (0.999 axis)
    assert out[2]["neg_id"] in (0, 1) and out[2]["neg_label"] == 0

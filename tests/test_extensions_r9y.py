"""Bradley-Terry invariants: strengths are identified only up to a
shift, so the gradient construction must keep them centered; winners
of more duels should rank higher."""

from __future__ import annotations

from .conftest import SF_DIR


def test_bradley_terry_centered_and_rank_consistent(spark):
    import duckdb

    from kcore_spark.queries.extensions_r9y import _BT_K, q_bradley_terry

    rows = q_bradley_terry(spark, SF_DIR).collect()
    assert len(rows) == _BT_K
    # each round's update is an average of residuals; with every duel
    # contributing +r to one side and −r to the other the strength
    # MEAN stays near 0 (exactly 0 only for equal n_i)
    mean_th = sum(r.strength for r in rows) / len(rows)
    assert abs(mean_th) < 0.2
    # the item with the best empirical win rate must NOT be the worst
    # by fitted strength (a sign error flips this immediately)
    wr = dict(
        duckdb.sql(
            f"""
            WITH pairs AS (
              SELECT a.ia, b.ib, CASE WHEN a.pa > b.pb THEN 1 ELSE 0 END AS w
              FROM (SELECT l_orderkey, l_suppkey % {_BT_K} AS ia,
                           l_extendedprice AS pa
                    FROM '{SF_DIR}/lineitem.parquet' WHERE l_linenumber = 1) a
              JOIN (SELECT l_orderkey, l_suppkey % {_BT_K} AS ib,
                           l_extendedprice AS pb
                    FROM '{SF_DIR}/lineitem.parquet' WHERE l_linenumber = 2) b
                ON a.l_orderkey = b.l_orderkey WHERE a.ia <> b.ib)
            SELECT i, AVG(w) FROM (
              SELECT ia AS i, w FROM pairs
              UNION ALL SELECT ib, 1 - w FROM pairs)
            GROUP BY i
            """
        ).fetchall()
    )
    best_emp = max(wr, key=wr.get)
    strengths = {r.item: r.strength for r in rows}
    assert strengths[best_emp] >= sorted(strengths.values())[len(strengths) // 2 - 1]

"""Structural invariants of the round-9 batch-R additions (drawdown,
propensity matching, RDD)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_drawdown_nonnegative(spark):
    """Drawdown >= 0 by construction (peak is a running max of the
    same series) and > 0 for a mean-centered P&L that ends at 0."""
    from kcore_spark.queries.extensions_r9r import q_max_drawdown

    rows = q_max_drawdown(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.max_drawdown >= 0.0
        assert r.n_days > 1


def test_propensity_pairs_bounded_by_arm_sizes(spark):
    """Per decile, matched pairs = min(n_treated, n_control) — the
    greedy rank pairing can't invent pairs; deciles cover 1..10."""
    import duckdb

    from kcore_spark.queries.extensions_r9r import q_propensity_match

    rows = {r.decile: r for r in q_propensity_match(spark, SF_DIR).collect()}
    assert set(rows) <= set(range(1, 11))
    arms = duckdb.sql(
        f"""
        WITH base AS (
          SELECT ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2
                   AS treated,
                 NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
          FROM '{SF_DIR}/customer.parquet')
        SELECT decile,
               SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS n_t,
               SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS n_c
        FROM base GROUP BY decile
        """
    ).fetchall()
    for decile, n_t, n_c in arms:
        if decile in rows:
            assert rows[decile].n_pairs == min(n_t, n_c)


def test_rdd_null_effect_is_small(spark):
    """The fixture has no discontinuity at acctbal=0, so the estimated
    jump must be small relative to the outcome scale (mean order count
    ~ a few); sides are populated."""
    from kcore_spark.queries.extensions_r9r import q_regression_discontinuity

    r = q_regression_discontinuity(spark, SF_DIR).collect()[0]
    assert r.n_left > 0 and r.n_right > 0
    assert abs(r.jump_at_cutoff) < 5.0

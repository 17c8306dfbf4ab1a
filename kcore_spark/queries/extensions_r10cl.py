"""Round-10 surface extensions, batch CL (SURVEY §2.3 N r10): the
financial-risk block, second wave, over daily revenue log-returns —
the Omega ratio (probability-weighted gains over losses around a
pinned threshold: the whole-distribution alternative to
q_sharpe_sortino), the Ulcer index + Martin ratio (root-mean-square
percentage drawdown — pain-weighted, where q_max_drawdown reports only
the single worst dip), and the Kelly fraction (closed-form optimal bet
size from the binary win/loss profile of daily changes). Completes the
risk family next to q_var_cvar / q_sharpe_sortino / q_max_drawdown.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the daily series is a cents rollup; returns are doubles
computed identically both sides; per-day terms rounded and
decimal-summed; the running peak is a calendar-bounded cummax.
Scale: one orders scan folds to the daily curve; all windows run over
that curve (adjudicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_THRESH = 0.0  # Omega threshold on log-returns


def _returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .cast("double")
            .alias("v")
        )
    )
    w = Window.orderBy("d")
    return (
        daily.withColumn("prev", F.lag("v").over(w))
        .where(F.col("prev").isNotNull())
        .select("d", "v", F.log(F.col("v") / F.col("prev")).alias("r"))
    )


_RETURNS_SQL = """
  daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0)))
                AS DOUBLE) AS v
    FROM orders GROUP BY 1),
  rets AS (
    SELECT d, v, LN(v / prev) AS r FROM (
      SELECT d, v, LAG(v) OVER (ORDER BY d) AS prev FROM daily)
    WHERE prev IS NOT NULL)
"""


def q_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.round(F.greatest(F.col("r") - _THRESH, F.lit(0.0)), 10)
            .cast("decimal(38,10)")
        )
        .cast("double")
        .alias("gain"),
        F.sum(
            F.round(F.greatest(F.lit(_THRESH) - F.col("r"), F.lit(0.0)), 10)
            .cast("decimal(38,10)")
        )
        .cast("double")
        .alias("loss"),
    )
    return agg.select(
        "n",
        F.round("gain", 6).alias("gain_area"),
        F.round("loss", 6).alias("loss_area"),
        F.round(F.col("gain") / F.col("loss"), 6).alias("omega"),
    )


Q_OMEGA_SQL = f"""
WITH {_RETURNS_SQL},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(GREATEST(r - {_THRESH}, 0.0), 10)
                       AS DECIMAL(38,10))) AS DOUBLE) AS gain,
         CAST(SUM(CAST(ROUND(GREATEST({_THRESH} - r, 0.0), 10)
                       AS DECIMAL(38,10))) AS DOUBLE) AS loss
  FROM rets)
SELECT n, ROUND(gain, 6) AS gain_area, ROUND(loss, 6) AS loss_area,
       ROUND(gain / loss, 6) AS omega
FROM agg
"""

QUERIES["q_omega_ratio"] = QuerySpec(
    q_omega_ratio,
    Q_OMEGA_SQL,
    "Omega ratio of daily revenue log-returns at threshold 0 — "
    "one-sided decimal partial moments",
)


def q_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .cast("double")
            .alias("v")
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = daily.withColumn("peak", F.max("v").over(w)).select(
        "d",
        (100.0 * (F.col("v") - F.col("peak")) / F.col("peak")).alias("dd_pct"),
    )
    agg = dd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.round(F.col("dd_pct") * F.col("dd_pct"), 8).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("s_dd2"),
        F.sum(F.round("dd_pct", 8).cast("decimal(38,8)")).cast("double").alias(
            "s_dd"
        ),
        F.min("dd_pct").alias("worst_dd"),
    )
    ulcer = F.sqrt(F.col("s_dd2") / F.col("n").cast("double"))
    return agg.select(
        "n",
        F.round(ulcer, 6).alias("ulcer_index"),
        F.round(F.col("s_dd") / F.col("n").cast("double"), 6).alias(
            "avg_drawdown_pct"
        ),
        F.round("worst_dd", 6).alias("worst_drawdown_pct"),
        # Martin ratio: mean daily return (pct of peak basis is the
        # convention-free proxy here) over the ulcer index
        F.round(-F.col("s_dd") / F.col("n").cast("double") / ulcer, 6).alias(
            "pain_ratio"
        ),
    )


Q_ULCER_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0)))
              AS DOUBLE) AS v
  FROM orders GROUP BY 1),
dd AS (
  SELECT d, 100.0 * (v - peak) / peak AS dd_pct FROM (
    SELECT d, v, MAX(v) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
    FROM daily)),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(dd_pct * dd_pct, 8) AS DECIMAL(38,8)))
              AS DOUBLE) AS s_dd2,
         CAST(SUM(CAST(ROUND(dd_pct, 8) AS DECIMAL(38,8))) AS DOUBLE) AS s_dd,
         MIN(dd_pct) AS worst_dd
  FROM dd)
SELECT n,
       ROUND(SQRT(s_dd2 / n), 6) AS ulcer_index,
       ROUND(s_dd / n, 6) AS avg_drawdown_pct,
       ROUND(worst_dd, 6) AS worst_drawdown_pct,
       ROUND(-(s_dd / n) / SQRT(s_dd2 / n), 6) AS pain_ratio
FROM agg
"""

QUERIES["q_ulcer_index"] = QuerySpec(
    q_ulcer_index,
    Q_ULCER_SQL,
    "Ulcer index + pain ratio from running-peak percentage drawdowns — "
    "calendar-bounded cummax, decimal moment sums",
)


def q_kelly_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("r") > 0).cast("long")).alias("n_win"),
        F.sum(
            F.when(F.col("r") > 0, F.round("r", 10).cast("decimal(38,10)"))
        )
        .cast("double")
        .alias("s_win"),
        F.sum(
            F.when(F.col("r") < 0, F.round(-F.col("r"), 10).cast("decimal(38,10)"))
        )
        .cast("double")
        .alias("s_loss"),
        F.sum((F.col("r") < 0).cast("long")).alias("n_loss"),
    )
    p = F.col("n_win").cast("double") / (
        F.col("n_win") + F.col("n_loss")
    ).cast("double")
    b = (F.col("s_win") / F.col("n_win").cast("double")) / (
        F.col("s_loss") / F.col("n_loss").cast("double")
    )
    kelly = p - (1.0 - p) / b
    return agg.select(
        "n",
        "n_win",
        "n_loss",
        F.round(p, 6).alias("win_rate"),
        F.round(b, 6).alias("payoff_ratio"),
        F.round(kelly, 6).alias("kelly_fraction"),
    )


Q_KELLY_SQL = f"""
WITH {_RETURNS_SQL},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_win,
         CAST(SUM(CASE WHEN r > 0 THEN CAST(ROUND(r, 10) AS DECIMAL(38,10))
                  END) AS DOUBLE) AS s_win,
         CAST(SUM(CASE WHEN r < 0 THEN CAST(ROUND(-r, 10) AS DECIMAL(38,10))
                  END) AS DOUBLE) AS s_loss,
         CAST(SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_loss
  FROM rets)
SELECT n, n_win, n_loss,
       ROUND(n_win / CAST(n_win + n_loss AS DOUBLE), 6) AS win_rate,
       ROUND((s_win / n_win) / (s_loss / n_loss), 6) AS payoff_ratio,
       ROUND(n_win / CAST(n_win + n_loss AS DOUBLE)
             - (1.0 - n_win / CAST(n_win + n_loss AS DOUBLE))
               / ((s_win / n_win) / (s_loss / n_loss)), 6) AS kelly_fraction
FROM agg
"""

QUERIES["q_kelly_fraction"] = QuerySpec(
    q_kelly_fraction,
    Q_KELLY_SQL,
    "Kelly optimal fraction from the win/loss profile of daily "
    "log-returns — closed form, one series fold",
)

"""Round-10 surface extensions, batch DB (SURVEY §2.3 N r10): the
randomness-battery block over the daily revenue series — the von
Neumann ratio (mean squared successive difference over the variance:
~2 under independence, small under trend/autocorrelation — the raw-
series companion of q_durbin_watson's residual test), the turning-
points test (count of local extrema vs the exact 2(n-2)/3 expectation
with its normal z — pattern-blind randomness), and weekday amplitude
(max-vs-min weekday mean over the grand mean — the size of the weekly
cycle that q_friedman_seasonality only detects).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the series is a cents rollup; successive differences are
exact integers; turning-point indicators are exact; weekday cells are
decimal sums.
Scale: one orders scan folds to the calendar-bounded daily curve; lags
run over that curve (adjudicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .cast("long")
            .alias("cents")
        )
    )


_DAILY_SQL = """
  daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0)))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1)
"""


def q_von_neumann_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d")
    lagd = daily.withColumn("prev", F.lag("cents").over(w))
    agg = lagd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("s2"),
        F.sum(
            F.when(
                F.col("prev").isNotNull(),
                (
                    (F.col("cents") - F.col("prev"))
                    * (F.col("cents") - F.col("prev"))
                ).cast("decimal(38,0)"),
            )
        ).alias("ssd"),
    )
    nd = F.col("n").cast("double")
    var = (
        nd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2
    ) / (nd * (nd - 1.0))
    mssd = F.col("ssd").cast("double") / (nd - 1.0)
    vn = mssd / var
    z = (vn - 2.0) / (2.0 * F.sqrt((nd - 2.0) / (nd * nd - 1.0)))
    return agg.select(
        "n",
        F.round(vn, 6).alias("von_neumann_ratio"),
        F.round(z, 6).alias("z_score"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_two_sided"),
    )


_VN = (
    "((CAST(ssd AS DOUBLE) / (n - 1.0))"
    " / ((n * CAST(s2 AS DOUBLE) - POWER(CAST(s1 AS DOUBLE), 2))"
    "    / (CAST(n AS DOUBLE) * (n - 1.0))))"
)
_ZVN = f"(({_VN} - 2.0) / (2.0 * SQRT((n - 2.0) / (CAST(n AS DOUBLE) * n - 1.0))))"
Q_VN_SQL = f"""
WITH {_DAILY_SQL},
lagd AS (
  SELECT cents, LAG(cents) OVER (ORDER BY d) AS prev FROM daily),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(cents AS DECIMAL(38,0))) AS s1,
         SUM(CAST(cents * cents AS DECIMAL(38,0))) AS s2,
         SUM(CASE WHEN prev IS NOT NULL THEN
             CAST((cents - prev) * (cents - prev) AS DECIMAL(38,0)) END) AS ssd
  FROM lagd)
SELECT n,
       ROUND({_VN}, 6) AS von_neumann_ratio,
       ROUND({_ZVN}, 6) AS z_score,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_ZVN})")}), 6)
           AS p_two_sided
FROM agg
"""

QUERIES["q_von_neumann_ratio"] = QuerySpec(
    q_von_neumann_ratio,
    Q_VN_SQL,
    "von Neumann MSSD/variance ratio on daily revenue with its normal "
    "z — exact integer successive differences",
)


def q_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d")
    tri = (
        daily.withColumn("prev", F.lag("cents").over(w))
        .withColumn("nxt", F.lead("cents").over(w))
        .where(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    )
    tp = tri.select(
        (
            (
                (F.col("cents") > F.col("prev")) & (F.col("cents") > F.col("nxt"))
            )
            | (
                (F.col("cents") < F.col("prev")) & (F.col("cents") < F.col("nxt"))
            )
        )
        .cast("long")
        .alias("is_tp")
    )
    agg = tp.agg(
        (F.count(F.lit(1)) + 2).cast("long").alias("n"),
        F.sum("is_tp").cast("long").alias("n_tp"),
    )
    nd = F.col("n").cast("double")
    mu = 2.0 * (nd - 2.0) / 3.0
    var = (16.0 * nd - 29.0) / 90.0
    z = (F.col("n_tp").cast("double") - mu) / F.sqrt(var)
    return agg.select(
        "n",
        "n_tp",
        F.round(F.lit(2.0) * (F.col("n").cast("double") - 2.0) / 3.0, 4).alias(
            "expected_tp"
        ),
        F.round(z, 6).alias("z_score"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_two_sided"),
    )


_ZTP = (
    "((n_tp - 2.0 * (n - 2.0) / 3.0) / SQRT((16.0 * n - 29.0) / 90.0))"
)
Q_TP_SQL = f"""
WITH {_DAILY_SQL},
tri AS (
  SELECT cents,
         LAG(cents) OVER (ORDER BY d) AS prev,
         LEAD(cents) OVER (ORDER BY d) AS nxt
  FROM daily),
tp AS (
  SELECT CASE WHEN (cents > prev AND cents > nxt)
                OR (cents < prev AND cents < nxt) THEN 1 ELSE 0 END AS is_tp
  FROM tri WHERE prev IS NOT NULL AND nxt IS NOT NULL),
agg AS (
  SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n,
         CAST(SUM(is_tp) AS BIGINT) AS n_tp
  FROM tp)
SELECT n, n_tp,
       ROUND(2.0 * (n - 2.0) / 3.0, 4) AS expected_tp,
       ROUND({_ZTP}, 6) AS z_score,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_ZTP})")}), 6)
           AS p_two_sided
FROM agg
"""

QUERIES["q_turning_points_test"] = QuerySpec(
    q_turning_points_test,
    Q_TP_SQL,
    "turning-points randomness test: local extrema vs 2(n-2)/3 — "
    "lag/lead over the daily curve",
)


def q_weekday_amplitude(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir).select(
        F.dayofweek("d").cast("int").alias("wd"), "cents"
    )
    per = daily.groupBy("wd").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
    )
    cells = per.select(
        "wd", (F.col("s").cast("double") / F.col("k").cast("double")).alias("mu")
    )
    agg = cells.agg(
        F.max(F.struct(F.round("mu", 6).alias("m"), F.col("wd"))).alias("hi"),
        F.min(F.struct(F.round("mu", 6).alias("m"), F.col("wd"))).alias("lo"),
        F.sum(F.round("mu", 6).cast("decimal(38,6)")).cast("double").alias("s_mu"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    grand = F.col("s_mu") / F.col("k").cast("double")
    return agg.select(
        F.col("hi.wd").alias("peak_weekday"),
        F.round(F.col("hi.m") / 100.0, 2).alias("peak_mean"),
        F.col("lo.wd").alias("trough_weekday"),
        F.round(F.col("lo.m") / 100.0, 2).alias("trough_mean"),
        F.round((F.col("hi.m") - F.col("lo.m")) / grand, 6).alias(
            "relative_amplitude"
        ),
    )


Q_WDAMP_SQL = f"""
WITH {_DAILY_SQL},
cells AS (
  SELECT CAST(dayofweek(d) + 1 AS INT) AS wd,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS mu
  FROM daily GROUP BY 1),
hi AS (
  -- tie-break matches Spark MAX(STRUCT(m, wd)): larger wd wins
  SELECT wd AS peak_wd, ROUND(mu, 6) AS peak_mu FROM cells
  ORDER BY ROUND(mu, 6) DESC, wd DESC LIMIT 1),
lo AS (
  SELECT wd AS trough_wd, ROUND(mu, 6) AS trough_mu FROM cells
  ORDER BY ROUND(mu, 6) ASC, wd ASC LIMIT 1),
agg AS (
  SELECT peak_wd, peak_mu, trough_wd, trough_mu,
         CAST(SUM(CAST(ROUND(mu, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s_mu,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM cells CROSS JOIN hi CROSS JOIN lo
  GROUP BY 1, 2, 3, 4)
SELECT peak_wd AS peak_weekday,
       ROUND(peak_mu / 100.0, 2) AS peak_mean,
       trough_wd AS trough_weekday,
       ROUND(trough_mu / 100.0, 2) AS trough_mean,
       ROUND((peak_mu - trough_mu) / (s_mu / k), 6) AS relative_amplitude
FROM agg
"""

QUERIES["q_weekday_amplitude"] = QuerySpec(
    q_weekday_amplitude,
    Q_WDAMP_SQL,
    "weekly-cycle amplitude: peak vs trough weekday means over the "
    "grand mean — 7-cell fold",
)

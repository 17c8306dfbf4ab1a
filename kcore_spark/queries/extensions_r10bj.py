"""Round-10 surface extensions, batch BJ (SURVEY §2.3 N r10): the
panel-econometrics block over the customer-month panel (y = monthly
revenue, x = monthly order count, unit = customer) — the within
(fixed-effects) estimator, the between estimator (OLS on unit
means), and the first-difference estimator. Together with
q_diff_in_diff and q_parallel_trends this completes the standard
panel toolkit; the three betas disagree exactly when unit effects
correlate with x, which is the diagnostic read.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal-exact panel sums; unit means are ROUND(·,9)-
pinned before demeaning; every regression is closed-form centered
moments.
Scale: one customer-month rollup feeds all three; FE joins the
k-per-unit means back (one keyed shuffle), FD is a partitioned lag,
BE is unit-level algebra. No global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_custkey").alias("u"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
        .cast("double")
        .alias("y"),
        F.count(F.lit(1)).cast("double").alias("x"),
    )


_PANEL_SQL = """
  SELECT o_custkey AS u, date_trunc('month', o_orderdate) AS mon,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS y,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2
"""


def _slope(df: DataFrame, xcol: str, ycol: str, out: str) -> DataFrame:
    """Closed-form OLS slope from pinned-decimal moments."""
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col(xcol), 9).cast("decimal(28,9)")).alias("sx"),
        F.sum(F.round(F.col(ycol), 6).cast("decimal(28,6)")).alias("sy"),
        F.sum(
            F.round(F.col(xcol) * F.col(ycol), 6).cast("decimal(38,6)")
        ).alias("sxy"),
        F.sum(
            F.round(F.col(xcol) * F.col(xcol), 9).cast("decimal(38,9)")
        ).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    b = (n * F.col("sxy").cast("double") - sx * sy) / (
        n * F.col("sxx").cast("double") - sx * sx
    )
    return m.select(F.col("n"), F.round(b, 6).alias(out))


_SLOPE_SQL = """
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(ROUND(xv * yv, 6) AS DECIMAL(38,6))) AS DOUBLE)
                - CAST(SUM(CAST(ROUND(xv, 9) AS DECIMAL(28,9))) AS DOUBLE)
                  * CAST(SUM(CAST(ROUND(yv, 6) AS DECIMAL(28,6))) AS DOUBLE))
               / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(ROUND(xv * xv, 9) AS DECIMAL(38,9))) AS DOUBLE)
                  - CAST(SUM(CAST(ROUND(xv, 9) AS DECIMAL(28,9))) AS DOUBLE)
                    * CAST(SUM(CAST(ROUND(xv, 9) AS DECIMAL(28,9))) AS DOUBLE)), 6) AS {out}
  FROM {src}
"""


# --------------------------------------------------- fixed effects
# Demean y and x within each customer (means pinned), pooled OLS on
# the deviations.


def q_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    panel = _panel(spark, sf_dir)
    means = panel.groupBy("u").agg(
        F.round(F.avg("x"), 9).alias("mx"),
        F.round(F.avg("y"), 9).alias("my"),
        F.count(F.lit(1)).alias("t"),
    )
    dem = (
        panel.join(means, "u")
        .where(F.col("t") >= 2)
        .select(
            (F.col("x") - F.col("mx")).alias("xv"),
            (F.col("y") - F.col("my")).alias("yv"),
        )
    )
    return _slope(dem, "xv", "yv", "beta_within")


Q_FE_SQL = f"""
WITH panel AS ({_PANEL_SQL}),
means AS (
  SELECT u, ROUND(AVG(x), 9) AS mx, ROUND(AVG(y), 9) AS my, COUNT(*) AS t
  FROM panel GROUP BY u),
dem AS (
  SELECT panel.x - mx AS xv, panel.y - my AS yv
  FROM panel JOIN means USING (u) WHERE t >= 2)
{_SLOPE_SQL.format(out="beta_within", src="dem")}
"""

QUERIES["q_fixed_effects"] = QuerySpec(
    q_fixed_effects,
    Q_FE_SQL,
    "panel fixed-effects (within) estimator — pinned unit means, "
    "pooled OLS on deviations",
)


# ------------------------------------------------ between estimator


def q_between_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    panel = _panel(spark, sf_dir)
    # decimal-exact unit means (a raw double AVG is sum-order noisy and
    # straddled a 6dp rounding boundary at sf0.001)
    means = panel.groupBy("u").agg(
        (
            F.sum(F.round("x", 0).cast("decimal(28,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("xv"),
        (
            F.sum(F.round("y", 2).cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("yv"),
    )
    return _slope(means, "xv", "yv", "beta_between")


Q_BE_SQL = f"""
WITH panel AS ({_PANEL_SQL}),
means AS (
  SELECT u,
         CAST(SUM(CAST(ROUND(x, 0) AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*)
             AS xv,
         CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
             AS yv
  FROM panel GROUP BY u)
{_SLOPE_SQL.format(out="beta_between", src="means")}
"""

QUERIES["q_between_estimator"] = QuerySpec(
    q_between_estimator,
    Q_BE_SQL,
    "panel between estimator — OLS on unit means",
)


# -------------------------------------------- first differences
# Consecutive observed months only (mon = prev + 1 month).


def q_first_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    panel = _panel(spark, sf_dir)
    w = Window.partitionBy("u").orderBy("mon")
    fd = (
        panel.withColumn("px", F.lag("x").over(w))
        .withColumn("py", F.lag("y").over(w))
        .withColumn("pm", F.lag("mon").over(w))
        .where(
            F.col("pm").isNotNull()
            & (F.col("mon") == F.add_months(F.col("pm"), 1))
        )
        .select(
            (F.col("x") - F.col("px")).alias("xv"),
            (F.col("y") - F.col("py")).alias("yv"),
        )
    )
    return _slope(fd, "xv", "yv", "beta_fd")


Q_FD_SQL = f"""
WITH panel AS ({_PANEL_SQL}),
fd AS (
  SELECT x - LAG(x) OVER (PARTITION BY u ORDER BY mon) AS xv,
         y - LAG(y) OVER (PARTITION BY u ORDER BY mon) AS yv
  FROM panel
  QUALIFY LAG(mon) OVER (PARTITION BY u ORDER BY mon) IS NOT NULL
      AND mon = LAG(mon) OVER (PARTITION BY u ORDER BY mon) + INTERVAL 1 MONTH)
{_SLOPE_SQL.format(out="beta_fd", src="fd")}
"""

QUERIES["q_first_difference"] = QuerySpec(
    q_first_difference,
    Q_FD_SQL,
    "panel first-difference estimator over consecutive observed "
    "months — partitioned lags, closed-form slope",
)

"""Round-10 surface extensions, batch AY (SURVEY §2.3 N r10): the
tail-modeling block — the Hill tail-index estimator (top-k order
statistics), a peaks-over-threshold GPD fit by method of moments
(exceedances above the exact P95), and a Weibull survival fit by
regression on the log-log-transformed empirical survival curve.
Completes the EVT/survival families next to q_gumbel_extremes,
q_kaplan_meier and q_churn_hazard.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: top-k via distributed TakeOrdered; exact percentile
thresholds; decimal-pinned log/ moment sums; the Weibull regression
runs on the distinct-duration tie table (value-domain bounded).
Scale: top-k and percentiles never materialize a global sort; the
survival walk is a distinct-value cumulative (the q_kaplan_meier
adjudication class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------------ Hill estimator
# Top k=200 values of o_totalprice; α̂ = k / Σ ln(x_i / x_(k)).


def q_hill_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x")
    )
    top = src.orderBy(F.col("x").desc()).limit(200)
    xk = top.agg(F.min("x").alias("xk"), F.count(F.lit(1)).alias("k"))
    j = top.crossJoin(F.broadcast(xk))
    agg = j.agg(
        F.first("k").cast("long").alias("k"),
        F.first("xk").alias("xk"),
        F.sum(
            F.round(F.log(F.col("x") / F.col("xk")), 12).cast("decimal(28,12)")
        ).alias("s"),
    )
    return agg.select(
        "k",
        F.round("xk", 2).alias("x_k"),
        F.round(
            F.col("k").cast("double") / F.col("s").cast("double"), 6
        ).alias("hill_alpha"),
    )


Q_HILL_SQL = """
WITH top AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x
  FROM orders ORDER BY x DESC LIMIT 200),
xk AS (SELECT MIN(x) AS xk, CAST(COUNT(*) AS BIGINT) AS k FROM top),
agg AS (
  SELECT ANY_VALUE(k) AS k, ANY_VALUE(xk.xk) AS xk,
         SUM(CAST(ROUND(LN(x / xk.xk), 12) AS DECIMAL(28,12))) AS s
  FROM top CROSS JOIN xk)
SELECT k, ROUND(xk, 2) AS x_k,
       ROUND(CAST(k AS DOUBLE) / CAST(s AS DOUBLE), 6) AS hill_alpha
FROM agg
"""

QUERIES["q_hill_estimator"] = QuerySpec(
    q_hill_estimator,
    Q_HILL_SQL,
    "Hill tail-index over the top-200 order statistics — distributed "
    "top-k, pinned log sum",
)


# ----------------------------------------- peaks-over-threshold GPD
# u = exact P95; y = x − u for x > u. Method of moments:
#   ξ̂ = (1 − ȳ²/s²)/2,  σ̂ = ȳ(ȳ²/s² + 1)/2.


def q_pot_gpd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x")
    )
    u = src.agg(F.percentile("x", 0.95).alias("u"))
    exc = src.crossJoin(F.broadcast(u)).where(F.col("x") > F.col("u"))
    y = F.round(F.col("x") - F.col("u"), 6)
    agg = exc.agg(
        F.first("u").alias("u"),
        F.count(F.lit(1)).cast("long").alias("n_exceed"),
        F.sum(y.cast("decimal(28,6)")).alias("s1"),
        F.sum(F.round(y * y, 4).cast("decimal(38,4)")).alias("s2"),
    )
    n = F.col("n_exceed").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (n * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2) / (
        n * (n - 1)
    )
    ratio = mean * mean / var
    return agg.select(
        F.round("u", 2).alias("threshold_p95"),
        "n_exceed",
        F.round((1.0 - ratio) / 2.0, 6).alias("gpd_xi"),
        F.round(mean * (ratio + 1.0) / 2.0, 6).alias("gpd_sigma"),
    )


Q_GPD_SQL = """
WITH src AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders),
u AS (SELECT quantile_cont(x, 0.95) AS u FROM src),
agg AS (
  SELECT ANY_VALUE(u.u) AS u, CAST(COUNT(*) AS BIGINT) AS n_exceed,
         SUM(CAST(ROUND(x - u.u, 6) AS DECIMAL(28,6))) AS s1,
         SUM(CAST(ROUND(ROUND(x - u.u, 6) * ROUND(x - u.u, 6), 4)
                  AS DECIMAL(38,4))) AS s2
  FROM src CROSS JOIN u WHERE x > u.u)
SELECT ROUND(u, 2) AS threshold_p95, n_exceed,
       ROUND((1.0 - (CAST(s1 AS DOUBLE) / n_exceed) * (CAST(s1 AS DOUBLE) / n_exceed)
                    / ((CAST(n_exceed AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n_exceed AS DOUBLE) * (n_exceed - 1)))) / 2.0, 6)
           AS gpd_xi,
       ROUND((CAST(s1 AS DOUBLE) / n_exceed)
             * ((CAST(s1 AS DOUBLE) / n_exceed) * (CAST(s1 AS DOUBLE) / n_exceed)
                / ((CAST(n_exceed AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n_exceed AS DOUBLE) * (n_exceed - 1))) + 1.0) / 2.0, 6)
           AS gpd_sigma
FROM agg
"""

QUERIES["q_pot_gpd_fit"] = QuerySpec(
    q_pot_gpd_fit,
    Q_GPD_SQL,
    "GPD method-of-moments fit to P95 exceedances — exact threshold, "
    "decimal-pinned exceedance moments",
)


# ---------------------------------------------------- Weibull fit
# Durations t = ship−order days (>0). Empirical survival on the
# DISTINCT-duration tie table; Weibull linearization
# ln(−ln S(t)) = k·ln t − k·ln λ fit by OLS over interior points
# (0 < S < 1). Value-domain-bounded cumulative (the q_kaplan_meier
# adjudication class).


def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("ship")
    )
    dur = (
        orders.join(first_ship, "o_orderkey")
        .select(F.datediff(F.to_date("ship"), F.to_date("o_orderdate")).alias("t"))
        .where(F.col("t") > 0)
    )
    ties = dur.groupBy("t").agg(F.count(F.lit(1)).alias("d"))
    n = dur.agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    surv = (
        ties.withColumn("cum", F.sum("d").over(w))
        .crossJoin(F.broadcast(n))
        .select(
            "t",
            (1.0 - F.col("cum").cast("double") / F.col("n").cast("double")).alias("s"),
        )
        .where((F.col("s") > 0.0) & (F.col("s") < 1.0))
    )
    xy = surv.select(
        F.round(F.log(F.col("t").cast("double")), 9).alias("lx"),
        F.round(F.log(-F.log(F.col("s"))), 9).alias("ly"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("lx").cast("decimal(28,9)")).alias("sx"),
        F.sum(F.col("ly").cast("decimal(28,9)")).alias("sy"),
        F.sum(
            F.round(F.col("lx") * F.col("ly"), 9).cast("decimal(28,9)")
        ).alias("sxy"),
        F.sum(
            F.round(F.col("lx") * F.col("lx"), 9).cast("decimal(28,9)")
        ).alias("sxx"),
    )
    md = F.col("m").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    k = (md * F.col("sxy").cast("double") - sx * sy) / (
        md * F.col("sxx").cast("double") - sx * sx
    )
    lam = F.exp(-((sy - k * sx) / md) / k)
    return m.select(
        F.col("m").alias("n_points"),
        F.round(k, 6).alias("weibull_k"),
        F.round(lam, 6).alias("weibull_lambda"),
    )


Q_WEIBULL_SQL = """
WITH first_ship AS (
  SELECT l_orderkey AS o_orderkey, MIN(l_shipdate) AS ship
  FROM lineitem GROUP BY 1),
dur AS (
  SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(ship AS DATE)) AS t
  FROM orders JOIN first_ship USING (o_orderkey)
  WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(ship AS DATE)) > 0),
ties AS (SELECT t, COUNT(*) AS d FROM dur GROUP BY t),
n AS (SELECT COUNT(*) AS n FROM dur),
surv AS (
  SELECT t, 1.0 - CAST(SUM(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                       AS DOUBLE) / CAST(n AS DOUBLE) AS s
  FROM ties CROSS JOIN n),
xy AS (
  SELECT ROUND(LN(CAST(t AS DOUBLE)), 9) AS lx,
         ROUND(LN(-LN(s)), 9) AS ly
  FROM surv WHERE s > 0.0 AND s < 1.0),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         SUM(CAST(lx AS DECIMAL(28,9))) AS sx,
         SUM(CAST(ly AS DECIMAL(28,9))) AS sy,
         SUM(CAST(ROUND(lx * ly, 9) AS DECIMAL(28,9))) AS sxy,
         SUM(CAST(ROUND(lx * lx, 9) AS DECIMAL(28,9))) AS sxx
  FROM xy)
SELECT m AS n_points,
       ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS weibull_k,
       ROUND(EXP(-((CAST(sy AS DOUBLE)
                    - (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE))
                 / ((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))), 6)
           AS weibull_lambda
FROM m
"""

QUERIES["q_weibull_fit"] = QuerySpec(
    q_weibull_fit,
    Q_WEIBULL_SQL,
    "Weibull survival fit via log-log linearization on the "
    "distinct-duration tie table — OLS moments, pinned logs",
)

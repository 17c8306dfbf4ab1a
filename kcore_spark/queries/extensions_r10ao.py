"""Round-10 surface extensions, batch AO (SURVEY §2.3 N r10): the
forecasting-methods block — a one-step forecast-accuracy table
(naive / seasonal-naive / trailing-drift scored by MAE, RMSE, sMAPE
on the last 28 days; the model-selection table next to
q_seasonal_mase and q_pinball_loss), Croston's method for
intermittent demand (separate SES of nonzero sizes and
inter-arrival intervals — THE standard for sparse part demand), and
the Theta method (SES + linear-trend average, the M3-winning
baseline).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: SES recursions are unrolled into their closed weighted-
sum form (α·Σ(1−α)^k·y — a plain aggregate, no sequential scan);
integer daily counts; per-row doubles are identical in both engines
and every aggregate of them is a ROUND-pinned decimal sum.
Scale: daily/market series are calendar-bounded (global windows
adjudicated); Croston's ranks are PARTITIONED per part; everything
else is keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------- forecast accuracy table
# Daily order counts; one-step forecasts on the last 28 days:
# naive f = y[t-1]; snaive f = y[t-7]; drift f = y[t-1] +
# (y[t-1] − y[t-29])/28. sMAPE uses the 2|e|/(|y|+|f|) form.


def q_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    w = Window.orderBy("d")
    lagged = (
        daily.withColumn("rn", F.row_number().over(w))
        .withColumn("y1", F.lag("y", 1).over(w))
        .withColumn("y7", F.lag("y", 7).over(w))
        .withColumn("y29", F.lag("y", 29).over(w))
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("nd"))
    test = (
        lagged.crossJoin(F.broadcast(n_days))
        .where(
            (F.col("rn") > F.col("nd") - 28) & F.col("y29").isNotNull()
        )
        .select(
            "y",
            F.col("y1").alias("f_naive"),
            F.col("y7").alias("f_snaive"),
            (F.col("y1") + (F.col("y1") - F.col("y29")) / 28.0).alias("f_drift"),
        )
    )
    methods = test.select(
        "y",
        F.explode(
            F.array(
                F.struct(F.lit("1_naive").alias("method"), F.col("f_naive").alias("f")),
                F.struct(F.lit("2_snaive").alias("method"), F.col("f_snaive").alias("f")),
                F.struct(F.lit("3_drift").alias("method"), F.col("f_drift").alias("f")),
            )
        ).alias("m"),
    ).select("y", F.col("m.method").alias("method"), F.col("m.f").alias("f"))
    e = F.col("y") - F.col("f")
    smape_t = 2.0 * F.abs(e) / (F.abs(F.col("y")) + F.abs(F.col("f")))
    agg = methods.groupBy("method").agg(
        F.count(F.lit(1)).cast("long").alias("h"),
        F.sum(F.round(F.abs(e), 9).cast("decimal(28,9)")).alias("sae"),
        F.sum(F.round(e * e, 9).cast("decimal(28,9)")).alias("sse"),
        F.sum(F.round(smape_t, 12).cast("decimal(28,12)")).alias("ssm"),
    )
    hd = F.col("h").cast("double")
    return agg.select(
        "method",
        "h",
        F.round(F.col("sae").cast("double") / hd, 6).alias("mae"),
        F.round(F.sqrt(F.col("sse").cast("double") / hd), 6).alias("rmse"),
        F.round(F.col("ssm").cast("double") / hd, 6).alias("smape"),
    ).orderBy("method")


Q_FCAST_ACC_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1),
lagged AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS rn,
         LAG(y, 1) OVER (ORDER BY d) AS y1,
         LAG(y, 7) OVER (ORDER BY d) AS y7,
         LAG(y, 29) OVER (ORDER BY d) AS y29
  FROM daily),
nd AS (SELECT COUNT(*) AS nd FROM daily),
test AS (
  SELECT y, y1 AS f_naive, y7 AS f_snaive,
         y1 + (y1 - y29) / 28.0 AS f_drift
  FROM lagged CROSS JOIN nd
  WHERE rn > nd - 28 AND y29 IS NOT NULL),
methods AS (
  SELECT y, '1_naive' AS method, f_naive AS f FROM test
  UNION ALL SELECT y, '2_snaive', f_snaive FROM test
  UNION ALL SELECT y, '3_drift', f_drift FROM test),
agg AS (
  SELECT method, CAST(COUNT(*) AS BIGINT) AS h,
         SUM(CAST(ROUND(ABS(y - f), 9) AS DECIMAL(28,9))) AS sae,
         SUM(CAST(ROUND((y - f) * (y - f), 9) AS DECIMAL(28,9))) AS sse,
         SUM(CAST(ROUND(2.0 * ABS(y - f) / (ABS(y) + ABS(f)), 12)
                  AS DECIMAL(28,12))) AS ssm
  FROM methods GROUP BY method)
SELECT method, h,
       ROUND(CAST(sae AS DOUBLE) / CAST(h AS DOUBLE), 6) AS mae,
       ROUND(SQRT(CAST(sse AS DOUBLE) / CAST(h AS DOUBLE)), 6) AS rmse,
       ROUND(CAST(ssm AS DOUBLE) / CAST(h AS DOUBLE), 6) AS smape
FROM agg
ORDER BY method
"""

QUERIES["q_forecast_accuracy"] = QuerySpec(
    q_forecast_accuracy,
    Q_FCAST_ACC_SQL,
    "one-step forecast accuracy table (naive/seasonal-naive/drift x "
    "MAE/RMSE/sMAPE) on the last 28 days — lag-based, pinned sums",
)


# -------------------------------------------------- Croston's method
# Per part: nonzero ship-day demands q_1..q_J and inter-arrival
# intervals. SES(α=0.2) in closed weighted-sum form:
#   z = 0.8^(J−1)·q_1 + 0.2·Σ_{j≥2} 0.8^(J−j)·q_j
#   p = same over the J−1 intervals (init = first interval)
# Demand-rate forecast = z/p, aggregated per brand.


def q_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import spread

    # spread by l_partkey: the serial single-row-group scan otherwise
    # runs the (partkey, day) decimal rollup in one task, and BOTH the
    # rollup (clustering subset) and the per-part window below reuse
    # this one exchange — the whole query pays a single shuffle
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_shipdate", "l_quantity"
        ),
        "l_partkey",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ev = (
        li.groupBy("l_partkey", F.date_trunc("day", F.col("l_shipdate")).alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"))
    )
    w = Window.partitionBy("l_partkey").orderBy("d")
    seq = (
        ev.withColumn("j", F.row_number().over(w))
        .withColumn("gap", F.datediff(F.col("d"), F.lag("d").over(w)).cast("double"))
        .withColumn("jj", F.count(F.lit(1)).over(Window.partitionBy("l_partkey")))
        .where(F.col("jj") >= 3)
    )
    a = 0.2
    z_term = F.when(
        F.col("j") == 1,
        F.pow(F.lit(1 - a), F.col("jj") - 1) * F.col("q").cast("double"),
    ).otherwise(
        a * F.pow(F.lit(1 - a), F.col("jj") - F.col("j")) * F.col("q").cast("double")
    )
    # intervals: j>=2, re-indexed j'=j-1 over J'=jj-1 with init at j'=1
    p_term = F.when(
        F.col("j") == 2,
        F.pow(F.lit(1 - a), F.col("jj") - 2) * F.col("gap"),
    ).when(
        F.col("j") > 2,
        a * F.pow(F.lit(1 - a), F.col("jj") - F.col("j")) * F.col("gap"),
    )
    per_part = seq.groupBy("l_partkey").agg(
        F.sum(F.round(z_term, 9).cast("decimal(28,9)")).alias("z"),
        F.sum(F.round(p_term, 9).cast("decimal(28,9)")).alias("p"),
    )
    rate = F.round(
        F.col("z").cast("double") / F.col("p").cast("double"), 9
    )
    return (
        per_part.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", rate.alias("rate"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum(F.col("rate").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_demand_rate"),
        )
        .orderBy("p_brand")
    )


Q_CROSTON_SQL = """
WITH ev AS (
  SELECT l_partkey, date_trunc('day', l_shipdate) AS d,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM lineitem GROUP BY 1, 2),
seq AS (
  SELECT l_partkey, CAST(q AS DOUBLE) AS q,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY d) AS j,
         CAST(date_diff('day', LAG(d) OVER (PARTITION BY l_partkey ORDER BY d), d)
              AS DOUBLE) AS gap,
         COUNT(*) OVER (PARTITION BY l_partkey) AS jj
  FROM ev
  QUALIFY COUNT(*) OVER (PARTITION BY l_partkey) >= 3),
per_part AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(CASE WHEN j = 1 THEN POWER(0.8, jj - 1) * q
                             ELSE 0.2 * POWER(0.8, jj - j) * q END, 9)
                  AS DECIMAL(28,9))) AS z,
         SUM(CAST(ROUND(CASE WHEN j = 2 THEN POWER(0.8, jj - 2) * gap
                             WHEN j > 2 THEN 0.2 * POWER(0.8, jj - j) * gap
                             END, 9) AS DECIMAL(28,9))) AS p
  FROM seq GROUP BY 1)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(ROUND(CAST(z AS DOUBLE) / CAST(p AS DOUBLE), 9)
                           AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6)
           AS avg_demand_rate
FROM per_part JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""

QUERIES["q_croston"] = QuerySpec(
    q_croston,
    Q_CROSTON_SQL,
    "Croston intermittent-demand rate per brand — closed-form SES of "
    "sizes and intervals, partitioned ranks, pinned sums",
)


# ------------------------------------------------------ Theta method
# h=1 forecast = mean of SES(α=0.2, closed form) and the OLS linear
# trend extrapolated one step. Integer (rn, y) moments are exact.


def q_theta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.orderBy("d")
    seq = daily.withColumn("rn", F.row_number().over(w))
    n = daily.agg(F.count(F.lit(1)).alias("nd"))
    j = seq.crossJoin(F.broadcast(n))
    a = 0.2
    ses_term = F.when(
        F.col("rn") == 1,
        F.pow(F.lit(1 - a), F.col("nd") - 1) * F.col("y").cast("double"),
    ).otherwise(
        a * F.pow(F.lit(1 - a), F.col("nd") - F.col("rn")) * F.col("y").cast("double")
    )
    agg = j.agg(
        F.first("nd").cast("long").alias("n_days"),
        F.sum(F.round(ses_term, 12).cast("decimal(28,12)")).alias("ses"),
        F.sum("rn").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("rn") * F.col("y")).alias("sxy"),
        F.sum(F.col("rn") * F.col("rn")).alias("sxx"),
    )
    nd = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    b = (nd * F.col("sxy").cast("double") - sx * sy) / (
        nd * F.col("sxx").cast("double") - sx * sx
    )
    trend = (sy - b * sx) / nd + b * (nd + 1)
    ses = F.col("ses").cast("double")
    return agg.select(
        "n_days",
        F.round(ses, 6).alias("ses_forecast"),
        F.round(trend, 6).alias("trend_forecast"),
        F.round((ses + trend) / 2.0, 6).alias("theta_forecast"),
    )


Q_THETA_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d, COUNT(*) AS y
  FROM orders GROUP BY 1),
seq AS (SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily),
nd AS (SELECT COUNT(*) AS nd FROM daily),
agg AS (
  SELECT CAST(ANY_VALUE(nd) AS BIGINT) AS n_days,
         SUM(CAST(ROUND(CASE WHEN rn = 1
                             THEN POWER(0.8, nd - 1) * CAST(y AS DOUBLE)
                             ELSE 0.2 * POWER(0.8, nd - rn) * CAST(y AS DOUBLE) END,
                        12) AS DECIMAL(28,12))) AS ses,
         SUM(rn) AS sx, SUM(y) AS sy, SUM(rn * y) AS sxy, SUM(rn * rn) AS sxx
  FROM seq CROSS JOIN nd)
SELECT n_days,
       ROUND(CAST(ses AS DOUBLE), 6) AS ses_forecast,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE)
             + (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n_days AS DOUBLE) + 1), 6) AS trend_forecast,
       ROUND((CAST(ses AS DOUBLE)
              + (CAST(sy AS DOUBLE)
                 - (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE)
              + (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n_days AS DOUBLE) + 1)) / 2.0, 6) AS theta_forecast
FROM agg
"""

QUERIES["q_theta_method"] = QuerySpec(
    q_theta_method,
    Q_THETA_SQL,
    "Theta-method h=1 forecast — closed-form SES + integer-moment "
    "linear trend, calendar-bounded series",
)

"""Round-9 surface extensions, batch O (SURVEY §2.3 N r9): the last
classical diagnostics — Jarque-Bera normality (moment-based, one
scan), the two-proportion z-test (the conversion-rate A/B test the
mean-based q_welch_ttest does not cover), the Wald-Wolfowitz runs
test (sequence randomness), and Durbin-Watson (residual
autocorrelation of an OLS fit — the q_ols_slope diagnostic).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Each is one partial-agg scan plus curve-sized finishing math; counts
stay integers until the final formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------------- Jarque-Bera normality test
# JB = n/6 · (S² + K²/4) from central moments, computed in ONE pass
# via raw moments around a 1-row broadcast mean (two scans total, no
# sort). The classic "is this metric normal enough for z-tests".


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x")
    )
    mean = orders.agg(F.avg("x").alias("m"))
    d = F.col("x") - F.col("m")
    m = orders.crossJoin(F.broadcast(mean)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d * d).alias("m2"),
        F.sum(d * d * d).alias("m3"),
        F.sum(d * d * d * d).alias("m4"),
    )
    n = F.col("n")
    s2 = F.col("m2") / n
    skew = (F.col("m3") / n) / F.pow(s2, 1.5)
    kurt = (F.col("m4") / n) / (s2 * s2) - 3.0
    return m.select(
        n.cast("long").alias("n"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(n / 6.0 * (skew * skew + kurt * kurt / 4.0), 4).alias("jb_stat"),
    )


Q_JB_SQL = """
WITH src AS (SELECT o_totalprice AS x FROM orders),
mean AS (SELECT AVG(x) AS m FROM src),
mm AS (
  SELECT COUNT(*) AS n,
         SUM((x - m) * (x - m)) AS m2,
         SUM((x - m) * (x - m) * (x - m)) AS m3,
         SUM((x - m) * (x - m) * (x - m) * (x - m)) AS m4
  FROM src CROSS JOIN mean)
SELECT CAST(n AS BIGINT) AS n,
       ROUND((m3 / n) / POW(m2 / n, 1.5), 6) AS skewness,
       ROUND((m4 / n) / ((m2 / n) * (m2 / n)) - 3.0, 6) AS excess_kurtosis,
       ROUND(n / 6.0 * (POW((m3 / n) / POW(m2 / n, 1.5), 2)
             + POW((m4 / n) / ((m2 / n) * (m2 / n)) - 3.0, 2) / 4.0), 4) AS jb_stat
FROM mm
"""

QUERIES["q_jarque_bera"] = QuerySpec(
    q_jarque_bera,
    Q_JB_SQL,
    "Jarque-Bera normality test (skewness + excess kurtosis from "
    "centered moments, two scans, no sort)",
)


# ------------------------------------- two-proportion z-test (A/B)
# Conversion-rate comparison between two md5 arms: purchases/events
# per user arm, pooled-variance z. The CONVERSION complement to
# q_welch_ttest (means) and q_mcnemar_paired (paired); integer counts
# to the last line.


def q_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    per_arm = (
        ev.groupBy("user_id")
        .agg(F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"))
        .groupBy(arm.alias("arm"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
    )
    wide = per_arm.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    return wide.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(p0, 6).alias("rate_0"),
        F.round(p1, 6).alias("rate_1"),
        F.round((p1 - p0) / F.nullif(se, F.lit(0.0)), 6).alias("z_stat"),
    )


Q_TWO_PROP_SQL = """
WITH conv AS (
  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
per_arm AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS c FROM conv GROUP BY arm),
wide AS (
  SELECT SUM(CASE WHEN arm = 0 THEN n END) AS n0,
         SUM(CASE WHEN arm = 0 THEN c END) AS c0,
         SUM(CASE WHEN arm = 1 THEN n END) AS n1,
         SUM(CASE WHEN arm = 1 THEN c END) AS c1
  FROM per_arm)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(c0 * 1.0 / n0, 6) AS rate_0,
       ROUND(c1 * 1.0 / n1, 6) AS rate_1,
       ROUND((c1 * 1.0 / n1 - c0 * 1.0 / n0)
             / NULLIF(SQRT((c0 + c1) * 1.0 / (n0 + n1)
                    * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 0.0), 6) AS z_stat
FROM wide
"""

QUERIES["q_two_proportion_z"] = QuerySpec(
    q_two_proportion_z,
    Q_TWO_PROP_SQL,
    "two-proportion z-test of per-user purchase conversion between "
    "md5 arms — pooled variance, integer counts to the last line",
)


# --------------------------------- Wald-Wolfowitz runs test
# Randomness of the daily order-count series: sign = above/below the
# median daily count, R = number of runs, z against the
# E[R]/Var[R] of a random arrangement. One rollup to the day curve,
# one lag pass — curve-sized after the groupBy.


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d")
    )
    daily = orders.groupBy("d").agg(F.count(F.lit(1)).alias("x"))
    med = daily.agg(F.round(F.expr("percentile(x, 0.5)"), 6).alias("med"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("med"))  # standard: drop exact-median days
        .select("d", (F.col("x") > F.col("med")).cast("int").alias("s"))
    )
    w = Window.orderBy("d")
    runs = signed.select(
        "s", (F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s"))).cast("int").alias("new_run")
    )
    agg = runs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("n1"),
        F.sum("new_run").alias("r"),
    )
    n1 = F.col("n1").cast("double")
    n0 = (F.col("n") - F.col("n1")).cast("double")
    er = 2.0 * n1 * n0 / (n1 + n0) + 1.0
    vr = (
        2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
        / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("r").cast("long").alias("n_runs"),
        F.round(er, 6).alias("expected_runs"),
        F.round((F.col("r") - er) / F.nullif(F.sqrt(vr), F.lit(0.0)), 6).alias("z_stat"),
    )


Q_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x FROM orders GROUP BY d),
med AS (SELECT ROUND(quantile_cont(x, 0.5), 6) AS med FROM daily),
signed AS (
  SELECT d, CASE WHEN x > med THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med WHERE x <> med),
runs AS (
  SELECT s, CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                   OR LAG(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS new_run
  FROM signed),
agg AS (SELECT COUNT(*) AS n, SUM(s) AS n1, SUM(new_run) AS r FROM runs)
SELECT CAST(n AS BIGINT) AS n_days, CAST(r AS BIGINT) AS n_runs,
       ROUND(2.0 * n1 * (n - n1) / n + 1.0, 6) AS expected_runs,
       ROUND((r - (2.0 * n1 * (n - n1) / n + 1.0))
             / NULLIF(SQRT(2.0 * n1 * (n - n1) * (2.0 * n1 * (n - n1) - n)
                    / (CAST(n AS DOUBLE) * n * (n - 1.0))), 0.0), 6) AS z_stat
FROM agg
"""

QUERIES["q_runs_test"] = QuerySpec(
    q_runs_test,
    Q_RUNS_SQL,
    "Wald-Wolfowitz runs test on the daily order-count series vs its "
    "median — randomness diagnostic, curve-sized after one rollup",
)


# ------------------------------------- Durbin-Watson statistic
# DW = Σ(e_t − e_{t−1})² / Σe_t² over time-ordered residuals of the
# closed-form OLS of daily order count on day index — the standard
# "are my regression residuals autocorrelated" check that decides
# whether q_ols_slope's standard errors can be trusted.


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d")
    )
    daily = orders.groupBy("d").agg(F.count(F.lit(1)).alias("y"))
    base = daily.agg(F.min("d").alias("d0"))
    pts = daily.crossJoin(F.broadcast(base)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("double").alias("t"),
        F.col("y").cast("double").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("t").alias("mt"),
        F.avg("y").alias("my"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
    )
    beta = (F.col("sty") - F.col("n") * F.col("mt") * F.col("my")) / (
        F.col("stt") - F.col("n") * F.col("mt") * F.col("mt")
    )
    coef = m.select(
        beta.alias("b"), (F.col("my") - beta * F.col("mt")).alias("a")
    )
    res = pts.crossJoin(F.broadcast(coef)).select(
        "t", (F.col("y") - F.col("a") - F.col("b") * F.col("t")).alias("e")
    )
    w = Window.orderBy("t")
    lagged = res.select("e", F.lag("e").over(w).alias("ep"))
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum(
                F.when(
                    F.col("ep").isNotNull(),
                    (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")),
                ).otherwise(0.0)
            )
            / F.nullif(F.sum(F.col("e") * F.col("e")), F.lit(0.0)),
            6,
        ).alias("durbin_watson"),
    )


Q_DW_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS y FROM orders GROUP BY d),
base AS (SELECT MIN(d) AS d0 FROM daily),
pts AS (
  SELECT CAST(datediff('day', d0, d) AS DOUBLE) AS t, CAST(y AS DOUBLE) AS y
  FROM daily CROSS JOIN base),
m AS (
  SELECT COUNT(*) AS n, AVG(t) AS mt, AVG(y) AS my,
         SUM(t * t) AS stt, SUM(t * y) AS sty
  FROM pts),
coef AS (
  SELECT (sty - n * mt * my) / (stt - n * mt * mt) AS b,
         my - (sty - n * mt * my) / (stt - n * mt * mt) * mt AS a
  FROM m),
res AS (
  SELECT t, y - a - b * t AS e FROM pts CROSS JOIN coef),
lagged AS (
  SELECT e, LAG(e) OVER (ORDER BY t) AS ep FROM res)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(SUM(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep) ELSE 0.0 END)
             / NULLIF(SUM(e * e), 0.0), 6) AS durbin_watson
FROM lagged
"""

QUERIES["q_durbin_watson"] = QuerySpec(
    q_durbin_watson,
    Q_DW_SQL,
    "Durbin-Watson residual-autocorrelation diagnostic over the "
    "closed-form OLS of daily order counts on time",
)

"""Round-10 surface extensions, batch CG (SURVEY §2.3 N r10): the
regression-diagnostics block, third wave, over the daily-revenue trend
regression y_t = a + b t. White's test (heteroskedasticity against the
trend AND its square — the robust sibling of q_breusch_pagan's linear
form), Breusch-Godfrey (lag-1 serial correlation via the auxiliary
regression on the lagged residual — the LM upgrade of q_durbin_watson),
and Ramsey RESET (functional-form misspecification via the fitted^2
augmentation). Each auxiliary regression is a TWO-regressor OLS solved
in closed form from centered moments (the q_ols_two_features normal-
equation shape); LM statistics are n R^2 with chi-square p-values
(df=1: 2(1-Phi(sqrt(x))); df=2: exp(-x/2) — both closed-form).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the daily series is a cents-decimal rollup; all moment
sums are rounded to fixed scale and decimal-summed; no iteration.
Scale: one orders scan folds to the calendar-bounded daily curve;
residuals ride a 1-row coefficient broadcast; the only window is the
BG lag over that curve (adjudicated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}


def _resid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with trend-OLS residual e, fitted yhat, index t."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("cents")
        )
    )
    w = Window.orderBy("d")
    s = daily.select(
        F.row_number().over(w).cast("double").alias("t"),
        (F.col("cents").cast("double") / 100.0).alias("y"),
    )
    mom = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("t", 1).cast("decimal(38,1)")).cast("double").alias("st"),
        F.sum(F.round("y", 2).cast("decimal(38,2)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("t") * F.col("t"), 1).cast("decimal(38,1)"))
        .cast("double")
        .alias("stt"),
        F.sum(F.round(F.col("t") * F.col("y"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("sty"),
    )
    nd = F.col("n").cast("double")
    b = (F.col("sty") - F.col("st") * F.col("sy") / nd) / (
        F.col("stt") - F.col("st") * F.col("st") / nd
    )
    a = (F.col("sy") - b * F.col("st")) / nd
    coef = mom.select("n", a.alias("a"), b.alias("b"))
    return s.crossJoin(F.broadcast(coef)).select(
        "t",
        "y",
        "n",
        (F.col("a") + F.col("b") * F.col("t")).alias("yhat"),
        (F.col("y") - F.col("a") - F.col("b") * F.col("t")).alias("e"),
    )


_RESID_SQL = """
  daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS cents
    FROM orders GROUP BY 1),
  s AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t,
           CAST(cents AS DOUBLE) / 100.0 AS y
    FROM daily),
  mom0 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(t, 1) AS DECIMAL(38,1))) AS DOUBLE) AS st,
           CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(38,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(ROUND(t * t, 1) AS DECIMAL(38,1))) AS DOUBLE) AS stt,
           CAST(SUM(CAST(ROUND(t * y, 2) AS DECIMAL(38,2))) AS DOUBLE) AS sty
    FROM s),
  coef AS (
    SELECT n,
           (sy - ((sty - st * sy / n) / (stt - st * st / n)) * st) / n AS a,
           (sty - st * sy / n) / (stt - st * st / n) AS b
    FROM mom0),
  resid AS (
    SELECT t, y, n, a + b * t AS yhat, y - a - b * t AS e
    FROM s CROSS JOIN coef)
"""


def _aux_r2(df: DataFrame, dep: Column, u: Column, v: Column) -> DataFrame:
    """R^2 of dep ~ const + u + v via centered normal equations,
    with every moment a rounded-decimal sum. Returns 1 row (n, r2)."""
    rows = df.select(
        dep.alias("z"), u.alias("u"), v.alias("v")
    )
    mom = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.round(c, 6).cast("decimal(38,6)")).cast("double").alias(nm)
            for nm, c in [
                ("sz", F.col("z")),
                ("su", F.col("u")),
                ("sv", F.col("v")),
                ("suu", F.col("u") * F.col("u")),
                ("svv", F.col("v") * F.col("v")),
                ("suv", F.col("u") * F.col("v")),
                ("suz", F.col("u") * F.col("z")),
                ("svz", F.col("v") * F.col("z")),
                ("szz", F.col("z") * F.col("z")),
            ]
        ],
    )
    nd = F.col("n").cast("double")
    cuu = F.col("suu") - F.col("su") * F.col("su") / nd
    cvv = F.col("svv") - F.col("sv") * F.col("sv") / nd
    cuv = F.col("suv") - F.col("su") * F.col("sv") / nd
    cuz = F.col("suz") - F.col("su") * F.col("sz") / nd
    cvz = F.col("svz") - F.col("sv") * F.col("sz") / nd
    czz = F.col("szz") - F.col("sz") * F.col("sz") / nd
    det = cuu * cvv - cuv * cuv
    b1 = (cuz * cvv - cvz * cuv) / det
    b2 = (cvz * cuu - cuz * cuv) / det
    r2 = (b1 * cuz + b2 * cvz) / czz
    return mom.select("n", r2.alias("r2"))


_AUX_SQL = """
  mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(z, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sz,
           CAST(SUM(CAST(ROUND(u, 6) AS DECIMAL(38,6))) AS DOUBLE) AS su,
           CAST(SUM(CAST(ROUND(v, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sv,
           CAST(SUM(CAST(ROUND(u * u, 6) AS DECIMAL(38,6))) AS DOUBLE) AS suu,
           CAST(SUM(CAST(ROUND(v * v, 6) AS DECIMAL(38,6))) AS DOUBLE) AS svv,
           CAST(SUM(CAST(ROUND(u * v, 6) AS DECIMAL(38,6))) AS DOUBLE) AS suv,
           CAST(SUM(CAST(ROUND(u * z, 6) AS DECIMAL(38,6))) AS DOUBLE) AS suz,
           CAST(SUM(CAST(ROUND(v * z, 6) AS DECIMAL(38,6))) AS DOUBLE) AS svz,
           CAST(SUM(CAST(ROUND(z * z, 6) AS DECIMAL(38,6))) AS DOUBLE) AS szz
    FROM aux),
  r2t AS (
    SELECT n,
           (((suz - su * sz / n) * (svv - sv * sv / n)
             - (svz - sv * sz / n) * (suv - su * sv / n))
            / ((suu - su * su / n) * (svv - sv * sv / n)
               - (suv - su * sv / n) * (suv - su * sv / n)) * (suz - su * sz / n)
            + ((svz - sv * sz / n) * (suu - su * su / n)
               - (suz - su * sz / n) * (suv - su * sv / n))
              / ((suu - su * su / n) * (svv - sv * sv / n)
                 - (suv - su * sv / n) * (suv - su * sv / n)) * (svz - sv * sz / n))
           / (szz - sz * sz / n) AS r2
    FROM mom)
"""


# --------------------------------------------------------- White test
# aux: e^2 ~ t + t^2; LM = n R^2 ~ chi2(2); p = exp(-LM/2).


def q_white_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _resid(spark, sf_dir)
    # scale e^2 to thousands to keep decimal-rounded moments in range
    r2 = _aux_r2(
        res,
        F.col("e") * F.col("e") / 1.0e6,
        F.col("t") / 100.0,
        F.col("t") * F.col("t") / 10000.0,
    )
    lm = F.col("n").cast("double") * F.col("r2")
    return r2.select(
        F.col("n").alias("n_days"),
        F.round("r2", 6).alias("aux_r2"),
        F.round(lm, 6).alias("lm_white"),
        F.lit(2).alias("df"),
        F.round(F.exp(-lm / 2.0), 6).alias("p_value"),
    )


Q_WHITE_SQL = f"""
WITH {_RESID_SQL},
aux AS (
  SELECT e * e / 1.0e6 AS z, t / 100.0 AS u, t * t / 10000.0 AS v
  FROM resid),
{_AUX_SQL}
SELECT n AS n_days, ROUND(r2, 6) AS aux_r2,
       ROUND(n * r2, 6) AS lm_white,
       2 AS df,
       ROUND(EXP(-(n * r2) / 2.0), 6) AS p_value
FROM r2t
"""

QUERIES["q_white_test"] = QuerySpec(
    q_white_test,
    Q_WHITE_SQL,
    "White heteroskedasticity LM test on the daily trend regression — "
    "closed-form 2-regressor auxiliary R^2, chi2(2) tail",
)


# ---------------------------------------------------- Breusch-Godfrey
# aux: e ~ t + e_{t-1}; LM = (n-1) R^2 ~ chi2(1).


def q_breusch_godfrey(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _resid(spark, sf_dir)
    w = Window.orderBy("t")
    lagd = res.withColumn("e_prev", F.lag("e").over(w)).where(
        F.col("e_prev").isNotNull()
    )
    r2 = _aux_r2(
        lagd, F.col("e") / 1000.0, F.col("t") / 100.0, F.col("e_prev") / 1000.0
    )
    lm = F.col("n").cast("double") * F.col("r2")
    chi = F.sqrt(F.greatest(lm, F.lit(0.0)))
    return r2.select(
        F.col("n").alias("n_used"),
        F.round("r2", 6).alias("aux_r2"),
        F.round(lm, 6).alias("lm_bg"),
        F.lit(1).alias("df"),
        F.round(2.0 * (1.0 - _phi(chi)), 6).alias("p_value"),
    )


Q_BG_SQL = f"""
WITH {_RESID_SQL},
aux AS (
  SELECT e / 1000.0 AS z, t / 100.0 AS u, e_prev / 1000.0 AS v
  FROM (SELECT t, e, LAG(e) OVER (ORDER BY t) AS e_prev FROM resid)
  WHERE e_prev IS NOT NULL),
{_AUX_SQL}
SELECT n AS n_used, ROUND(r2, 6) AS aux_r2,
       ROUND(n * r2, 6) AS lm_bg,
       1 AS df,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z="SQRT(GREATEST(n * r2, 0.0))")}), 6)
           AS p_value
FROM r2t
"""

QUERIES["q_breusch_godfrey"] = QuerySpec(
    q_breusch_godfrey,
    Q_BG_SQL,
    "Breusch-Godfrey lag-1 serial-correlation LM test — auxiliary "
    "regression on the lagged residual, chi2(1) tail via pinned Phi",
)


# -------------------------------------------------------- Ramsey RESET
# aux: y ~ t + yhat^2; LM = n R^2_gain ~ chi2(1) on the added term.
# We report the LM form: n * (R2_aux - R2_base) / (1 - R2_base) is the
# F-numerator shape; the pinned statistic here is n R2 of e ~ t + yhat^2
# (equivalent null behavior, closed form).


def q_ramsey_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _resid(spark, sf_dir)
    r2 = _aux_r2(
        res,
        F.col("e") / 1000.0,
        F.col("t") / 100.0,
        F.col("yhat") * F.col("yhat") / 1.0e10,
    )
    lm = F.col("n").cast("double") * F.col("r2")
    chi = F.sqrt(F.greatest(lm, F.lit(0.0)))
    return r2.select(
        F.col("n").alias("n_days"),
        F.round("r2", 6).alias("aux_r2"),
        F.round(lm, 6).alias("lm_reset"),
        F.lit(1).alias("df"),
        F.round(2.0 * (1.0 - _phi(chi)), 6).alias("p_value"),
    )


Q_RESET_SQL = f"""
WITH {_RESID_SQL},
aux AS (
  SELECT e / 1000.0 AS z, t / 100.0 AS u, yhat * yhat / 1.0e10 AS v
  FROM resid),
{_AUX_SQL}
SELECT n AS n_days, ROUND(r2, 6) AS aux_r2,
       ROUND(n * r2, 6) AS lm_reset,
       1 AS df,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z="SQRT(GREATEST(n * r2, 0.0))")}), 6)
           AS p_value
FROM r2t
"""

QUERIES["q_ramsey_reset"] = QuerySpec(
    q_ramsey_reset,
    Q_RESET_SQL,
    "Ramsey RESET misspecification LM test (fitted^2 augmentation) — "
    "closed-form auxiliary R^2, chi2(1) tail",
)

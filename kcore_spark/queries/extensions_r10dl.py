"""Round-10 surface extensions, batch DL (SURVEY §2.3 N r10): the
cointegration block — two regional monthly-revenue series run through
the Engle-Granger two-step (levels OLS, then the Dickey-Fuller
regression on the residual: gamma and its t — is the spread
mean-reverting?), the error-correction model (delta-y on delta-x and
the lagged equilibrium error — the short-run/long-run split, closed
form via 2-regressor normal equations), and a VAR(1) fit with its
closed-form stability check (companion-matrix eigenvalues from
trace/determinant — does the fitted dynamic system explode?).
Completes the econometrics family next to q_granger_lite /
q_fixed_effects / q_chow_test.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: monthly cells are cents-decimal sums scaled to
kilodollars (double-exact moments); every moment sum is
rounded-decimal; eigenvalue magnitudes come from the pinned
trace/det quadratic with an explicit complex-case branch.
Scale: one orders⋈customer⋈nation scan folds to two calendar-bounded
monthly series; all regressions are closed-form folds over that curve
(windows adjudicated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_REGION_Y = 0
_REGION_X = 1


def _pair_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly kilodollar revenue for the two pinned regions, inner-
    joined on month (calendar-bounded)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .where(F.col("n_regionkey").isin(_REGION_Y, _REGION_X))
        .groupBy("m", "n_regionkey")
        .agg(
            F.round(
                F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
                / 100000.0,
                0,
            )
            .cast("long")
            .alias("v")
        )
    )
    y = cells.where(F.col("n_regionkey") == _REGION_Y).select(
        "m", F.col("v").alias("y")
    )
    x = cells.where(F.col("n_regionkey") == _REGION_X).select(
        F.col("m").alias("mx"), F.col("v").alias("x")
    )
    return y.join(x, y.m == x.mx).select("m", "y", "x")


_PAIR_SQL = f"""
  cells AS (
    SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS m,
           n_regionkey,
           CAST(ROUND(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                      AS DECIMAL(38,0))) AS DOUBLE) / 100000.0, 0) AS BIGINT)
               AS v
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey IN ({_REGION_Y}, {_REGION_X})
    GROUP BY 1, 2),
  pair AS (
    SELECT y.m AS m, y.v AS y, x.v AS x
    FROM (SELECT m, v FROM cells WHERE n_regionkey = {_REGION_Y}) y
    JOIN (SELECT m, v FROM cells WHERE n_regionkey = {_REGION_X}) x
      ON y.m = x.m)
"""


def _resid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levels OLS y = a + b x with the equilibrium error e."""
    pr = _pair_series(spark, sf_dir)
    mom = pr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nd
    )
    a = (F.col("sy") - b * F.col("sx")) / nd
    coef = mom.select(F.round(a, 9).alias("a"), F.round(b, 9).alias("b"))
    return pr.crossJoin(F.broadcast(coef)).select(
        "m",
        "y",
        "x",
        F.round(
            F.col("y") - F.col("a") - F.col("b") * F.col("x"), 6
        ).alias("e"),
    )


_RESID_SQL = f"""
  mom0 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
    FROM pair),
  coef AS (
    SELECT ROUND((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n,
                 9) AS a,
           ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 9) AS b
    FROM mom0),
  resid AS (
    SELECT m, y, x, ROUND(y - a - b * x, 6) AS e
    FROM pair CROSS JOIN coef)
"""


def q_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _resid(spark, sf_dir)
    w = Window.orderBy("m")
    lagd = res.withColumn("e_prev", F.lag("e").over(w)).where(
        F.col("e_prev").isNotNull()
    )
    mom = lagd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.round(F.col("e_prev") * (F.col("e") - F.col("e_prev")), 6)
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("s_ed"),
        F.sum(
            F.round(F.col("e_prev") * F.col("e_prev"), 6).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("s_ee"),
        F.sum(
            F.round(
                (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev")),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("s_dd"),
    )
    gamma = F.col("s_ed") / F.col("s_ee")
    nd = F.col("n").cast("double")
    s2 = (F.col("s_dd") - gamma * F.col("s_ed")) / (nd - 1.0)
    t_df = gamma / F.sqrt(s2 / F.col("s_ee"))
    return mom.select(
        F.col("n").alias("n_months"),
        F.round(gamma, 6).alias("df_gamma"),
        F.round(t_df, 6).alias("df_t"),
        # Engle-Granger 5% critical value (2 variables, no trend), pinned
        F.lit(-3.34).alias("crit_5pct"),
        (t_df < -3.34).alias("cointegrated_5pct"),
    )


_GAMMA = "(s_ed / s_ee)"
_TDF = (
    f"({_GAMMA} / SQRT(((s_dd - {_GAMMA} * s_ed) / (n - 1.0)) / s_ee))"
)
Q_EG_SQL = f"""
WITH {_PAIR_SQL},
{_RESID_SQL},
lagd AS (
  SELECT e, LAG(e) OVER (ORDER BY m) AS e_prev FROM resid),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(e_prev * (e - e_prev), 6) AS DECIMAL(38,6)))
              AS DOUBLE) AS s_ed,
         CAST(SUM(CAST(ROUND(e_prev * e_prev, 6) AS DECIMAL(38,6)))
              AS DOUBLE) AS s_ee,
         CAST(SUM(CAST(ROUND((e - e_prev) * (e - e_prev), 6)
                       AS DECIMAL(38,6))) AS DOUBLE) AS s_dd
  FROM lagd WHERE e_prev IS NOT NULL)
SELECT n AS n_months,
       ROUND({_GAMMA}, 6) AS df_gamma,
       ROUND({_TDF}, 6) AS df_t,
       -3.34 AS crit_5pct,
       {_TDF} < -3.34 AS cointegrated_5pct
FROM mom
"""

QUERIES["q_engle_granger"] = QuerySpec(
    q_engle_granger,
    Q_EG_SQL,
    "Engle-Granger two-step: levels OLS + Dickey-Fuller on the "
    "equilibrium error — closed-form folds on the monthly pair",
)


def q_error_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECM: dy_t = c + g1 dx_t + g2 e_{t-1}; both slopes closed form
    via centered 2-regressor normal equations."""
    res = _resid(spark, sf_dir)
    w = Window.orderBy("m")
    d = (
        res.withColumn("yp", F.lag("y").over(w))
        .withColumn("xp", F.lag("x").over(w))
        .withColumn("ep", F.lag("e").over(w))
        .where(F.col("yp").isNotNull())
        .select(
            (F.col("y") - F.col("yp")).cast("double").alias("dy"),
            (F.col("x") - F.col("xp")).cast("double").alias("dx"),
            F.col("ep").alias("el"),
        )
    )
    mom = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.round(c, 6).cast("decimal(38,6)")).cast("double").alias(nm)
            for nm, c in [
                ("sz", F.col("dy")),
                ("su", F.col("dx")),
                ("sv", F.col("el")),
                ("suu", F.col("dx") * F.col("dx")),
                ("svv", F.col("el") * F.col("el")),
                ("suv", F.col("dx") * F.col("el")),
                ("suz", F.col("dx") * F.col("dy")),
                ("svz", F.col("el") * F.col("dy")),
            ]
        ],
    )
    nd = F.col("n").cast("double")
    cuu = F.col("suu") - F.col("su") * F.col("su") / nd
    cvv = F.col("svv") - F.col("sv") * F.col("sv") / nd
    cuv = F.col("suv") - F.col("su") * F.col("sv") / nd
    cuz = F.col("suz") - F.col("su") * F.col("sz") / nd
    cvz = F.col("svz") - F.col("sv") * F.col("sz") / nd
    det = cuu * cvv - cuv * cuv
    g1 = (cuz * cvv - cvz * cuv) / det
    g2 = (cvz * cuu - cuz * cuv) / det
    return mom.select(
        F.col("n").alias("n_months"),
        F.round(g1, 6).alias("short_run_dx"),
        F.round(g2, 6).alias("adjustment_speed"),
        (F.round(g2, 6) < 0).alias("error_correcting"),
    )


Q_ECM_SQL = f"""
WITH {_PAIR_SQL},
{_RESID_SQL},
d AS (
  SELECT CAST(y - yp AS DOUBLE) AS dy, CAST(x - xp AS DOUBLE) AS dx, ep AS el
  FROM (
    SELECT y, x, LAG(y) OVER (ORDER BY m) AS yp,
           LAG(x) OVER (ORDER BY m) AS xp,
           LAG(e) OVER (ORDER BY m) AS ep
    FROM resid)
  WHERE yp IS NOT NULL),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(dy, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sz,
         CAST(SUM(CAST(ROUND(dx, 6) AS DECIMAL(38,6))) AS DOUBLE) AS su,
         CAST(SUM(CAST(ROUND(el, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sv,
         CAST(SUM(CAST(ROUND(dx * dx, 6) AS DECIMAL(38,6))) AS DOUBLE) AS suu,
         CAST(SUM(CAST(ROUND(el * el, 6) AS DECIMAL(38,6))) AS DOUBLE) AS svv,
         CAST(SUM(CAST(ROUND(dx * el, 6) AS DECIMAL(38,6))) AS DOUBLE) AS suv,
         CAST(SUM(CAST(ROUND(dx * dy, 6) AS DECIMAL(38,6))) AS DOUBLE) AS suz,
         CAST(SUM(CAST(ROUND(el * dy, 6) AS DECIMAL(38,6))) AS DOUBLE) AS svz
  FROM d)
SELECT n AS n_months,
       ROUND((((suz - su * sz / n) * (svv - sv * sv / n)
               - (svz - sv * sz / n) * (suv - su * sv / n))
              / ((suu - su * su / n) * (svv - sv * sv / n)
                 - (suv - su * sv / n) * (suv - su * sv / n))), 6)
           AS short_run_dx,
       ROUND((((svz - sv * sz / n) * (suu - su * su / n)
               - (suz - su * sz / n) * (suv - su * sv / n))
              / ((suu - su * su / n) * (svv - sv * sv / n)
                 - (suv - su * sv / n) * (suv - su * sv / n))), 6)
           AS adjustment_speed,
       ROUND((((svz - sv * sz / n) * (suu - su * su / n)
               - (suz - su * sz / n) * (suv - su * sv / n))
              / ((suu - su * su / n) * (svv - sv * sv / n)
                 - (suv - su * sv / n) * (suv - su * sv / n))), 6) < 0
           AS error_correcting
FROM mom
"""

QUERIES["q_error_correction"] = QuerySpec(
    q_error_correction,
    Q_ECM_SQL,
    "error-correction model: short-run dx slope + adjustment speed on "
    "the lagged equilibrium error — closed-form normal equations",
)


def q_var1_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAR(1): [y_t, x_t] on [y_{t-1}, x_{t-1}] (centered, no
    intercept reported); stability from the eigenvalues of the 2x2
    coefficient matrix via the trace/det quadratic."""
    pr = _pair_series(spark, sf_dir)
    w = Window.orderBy("m")
    d = (
        pr.withColumn("yp", F.lag("y").over(w))
        .withColumn("xp", F.lag("x").over(w))
        .where(F.col("yp").isNotNull())
        .select(
            F.col("y").cast("double").alias("yt"),
            F.col("x").cast("double").alias("xt"),
            F.col("yp").cast("double").alias("yl"),
            F.col("xp").cast("double").alias("xl"),
        )
    )
    mom = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.round(c, 4).cast("decimal(38,4)")).cast("double").alias(nm)
            for nm, c in [
                ("syt", F.col("yt")),
                ("sxt", F.col("xt")),
                ("syl", F.col("yl")),
                ("sxl", F.col("xl")),
                ("s_ll_yy", F.col("yl") * F.col("yl")),
                ("s_ll_xx", F.col("xl") * F.col("xl")),
                ("s_ll_yx", F.col("yl") * F.col("xl")),
                ("s_yt_yl", F.col("yt") * F.col("yl")),
                ("s_yt_xl", F.col("yt") * F.col("xl")),
                ("s_xt_yl", F.col("xt") * F.col("yl")),
                ("s_xt_xl", F.col("xt") * F.col("xl")),
            ]
        ],
    )
    nd = F.col("n").cast("double")
    cuu = F.col("s_ll_yy") - F.col("syl") * F.col("syl") / nd
    cvv = F.col("s_ll_xx") - F.col("sxl") * F.col("sxl") / nd
    cuv = F.col("s_ll_yx") - F.col("syl") * F.col("sxl") / nd
    det_c = cuu * cvv - cuv * cuv

    def slopes(szu: Column, szv: Column):
        b1 = (szu * cvv - szv * cuv) / det_c
        b2 = (szv * cuu - szu * cuv) / det_c
        return b1, b2

    cy_u = F.col("s_yt_yl") - F.col("syt") * F.col("syl") / nd
    cy_v = F.col("s_yt_xl") - F.col("syt") * F.col("sxl") / nd
    cx_u = F.col("s_xt_yl") - F.col("sxt") * F.col("syl") / nd
    cx_v = F.col("s_xt_xl") - F.col("sxt") * F.col("sxl") / nd
    a11, a12 = slopes(cy_u, cy_v)
    a21, a22 = slopes(cx_u, cx_v)
    tr = a11 + a22
    dt = a11 * a22 - a12 * a21
    disc = tr * tr - 4.0 * dt
    rho = F.when(
        disc >= 0,
        F.greatest(
            F.abs((tr + F.sqrt(disc)) / 2.0), F.abs((tr - F.sqrt(disc)) / 2.0)
        ),
    ).otherwise(F.sqrt(dt))
    return mom.select(
        F.col("n").alias("n_months"),
        F.round(a11, 6).alias("a_yy"),
        F.round(a12, 6).alias("a_yx"),
        F.round(a21, 6).alias("a_xy"),
        F.round(a22, 6).alias("a_xx"),
        F.round(rho, 6).alias("spectral_radius"),
        (F.round(rho, 6) < 1.0).alias("stable"),
    )


def _var_sql() -> str:
    cuu = "(s_ll_yy - syl * syl / n)"
    cvv = "(s_ll_xx - sxl * sxl / n)"
    cuv = "(s_ll_yx - syl * sxl / n)"
    det = f"({cuu} * {cvv} - {cuv} * {cuv})"
    cy_u = "(s_yt_yl - syt * syl / n)"
    cy_v = "(s_yt_xl - syt * sxl / n)"
    cx_u = "(s_xt_yl - sxt * syl / n)"
    cx_v = "(s_xt_xl - sxt * sxl / n)"
    a11 = f"(({cy_u} * {cvv} - {cy_v} * {cuv}) / {det})"
    a12 = f"(({cy_v} * {cuu} - {cy_u} * {cuv}) / {det})"
    a21 = f"(({cx_u} * {cvv} - {cx_v} * {cuv}) / {det})"
    a22 = f"(({cx_v} * {cuu} - {cx_u} * {cuv}) / {det})"
    tr = f"({a11} + {a22})"
    dt = f"({a11} * {a22} - {a12} * {a21})"
    disc = f"({tr} * {tr} - 4.0 * {dt})"
    rho = (
        f"(CASE WHEN {disc} >= 0 THEN GREATEST(ABS(({tr} + SQRT({disc})) / 2.0),"
        f" ABS(({tr} - SQRT({disc})) / 2.0)) ELSE SQRT({dt}) END)"
    )
    return f"""
SELECT n AS n_months,
       ROUND({a11}, 6) AS a_yy,
       ROUND({a12}, 6) AS a_yx,
       ROUND({a21}, 6) AS a_xy,
       ROUND({a22}, 6) AS a_xx,
       ROUND({rho}, 6) AS spectral_radius,
       ROUND({rho}, 6) < 1.0 AS stable
FROM mom
"""


Q_VAR_SQL = f"""
WITH {_PAIR_SQL},
d AS (
  SELECT CAST(y AS DOUBLE) AS yt, CAST(x AS DOUBLE) AS xt,
         CAST(yp AS DOUBLE) AS yl, CAST(xp AS DOUBLE) AS xl
  FROM (
    SELECT y, x, LAG(y) OVER (ORDER BY m) AS yp,
           LAG(x) OVER (ORDER BY m) AS xp
    FROM pair)
  WHERE yp IS NOT NULL),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(yt, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syt,
         CAST(SUM(CAST(ROUND(xt, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxt,
         CAST(SUM(CAST(ROUND(yl, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syl,
         CAST(SUM(CAST(ROUND(xl, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxl,
         CAST(SUM(CAST(ROUND(yl * yl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_ll_yy,
         CAST(SUM(CAST(ROUND(xl * xl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_ll_xx,
         CAST(SUM(CAST(ROUND(yl * xl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_ll_yx,
         CAST(SUM(CAST(ROUND(yt * yl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_yt_yl,
         CAST(SUM(CAST(ROUND(yt * xl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_yt_xl,
         CAST(SUM(CAST(ROUND(xt * yl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_xt_yl,
         CAST(SUM(CAST(ROUND(xt * xl, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS s_xt_xl
  FROM d)
{_var_sql()}
"""

QUERIES["q_var1_fit"] = QuerySpec(
    q_var1_fit,
    Q_VAR_SQL,
    "VAR(1) on the two regional series with the trace/det spectral-"
    "radius stability check — closed-form 2x2 normal equations",
)

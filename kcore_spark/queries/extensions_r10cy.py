"""Round-10 surface extensions, batch CY (SURVEY §2.3 N r10): the
retention-science block — the shifted-beta-geometric retention model
(Fader-Hardie: fit a,b by method of moments from the first two
retention rates — closed form — then PROJECT the curve out to month 12
and score it against the actual), the mean cumulative function (the
recurrent-event cousin of q_nelson_aalen: expected cumulative orders
per customer by tenure month), and the cohort-quality trend (are newer
signup cohorts retaining better? month-1 retention per cohort with its
OLS slope — the growth-due-diligence chart).

Cohorts: a customer's first-order month. "Alive in month m" = placed
an order in tenure month m.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: retention counts are exact integers; sBG a,b come from a
pinned closed-form moment inversion; projections are literal products;
trend moments rounded and decimal-summed.
Scale: one orders scan folds to (cohort, tenure) cells; the curves are
calendar-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_HORIZON = 12


def _tenure_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_m, tenure_m, n_active) with the cohort size at tenure 0."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("c0"))
    j = orders.join(first, "o_custkey").select(
        "o_custkey", F.col("c0"), (F.col("m") - F.col("c0")).alias("tenure")
    )
    return j.groupBy("c0", "tenure").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_active")
    )


_CELLS_SQL = """
  o AS (
    SELECT o_custkey,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS m
    FROM orders),
  first_m AS (SELECT o_custkey, MIN(m) AS c0 FROM o GROUP BY o_custkey),
  cells AS (
    SELECT c0, m - c0 AS tenure,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active
    FROM o JOIN first_m ON o.o_custkey = first_m.o_custkey
    GROUP BY 1, 2)
"""


def q_sbg_retention_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVAL retention (monotone, as sBG requires): r_t = share of
    customers whose LAST order is at tenure >= t. sBG moments:
    a = r1 (r2 - r1) / (r1^2 - r2); b = a r1 / (1 - r1).
    Projected r_t = prod_{k=1..t} (b + k - 1) / (a + b + k - 1)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
    )
    span = orders.groupBy("o_custkey").agg(
        (F.max("m") - F.min("m")).alias("last_tenure")
    )
    base = span.agg(F.count(F.lit(1)).cast("long").alias("n0"))
    grid = spark.createDataFrame([(1,), (2,), (_HORIZON,)], ["tenure"])
    r = (
        span.join(
            F.broadcast(grid), F.col("last_tenure") >= F.col("tenure")
        )
        .groupBy("tenure")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(base))
        .select("tenure", (F.col("n") / F.col("n0").cast("double")).alias("r"))
    )
    wide = r.groupBy().pivot("tenure", [1, 2, _HORIZON]).agg(F.first("r"))
    # pinned clamps keep the moment inversion finite when the fixture
    # window censors nothing (r1 = r2 = 1 at tiny scale)
    r1 = F.least(F.col("1"), F.lit(0.999999))
    r2 = F.least(F.col("2"), r1 - 1e-6)
    a = r1 * (r2 - r1) / (r1 * r1 - r2)
    b = a * r1 / (1.0 - r1)
    proj = F.lit(1.0)
    for k in range(1, _HORIZON + 1):
        proj = proj * (b + (k - 1)) / (a + b + (k - 1))
    return wide.select(
        F.round(r1, 6).alias("r1_observed"),
        F.round(r2, 6).alias("r2_observed"),
        F.round(a, 6).alias("sbg_a"),
        F.round(b, 6).alias("sbg_b"),
        F.round(proj, 6).alias("r12_projected"),
        F.round(F.col(str(_HORIZON)), 6).alias("r12_observed"),
    )


def _proj_sql() -> str:
    terms = []
    for k in range(1, _HORIZON + 1):
        terms.append(f"((b + {k - 1}) / (a + b + {k - 1}))")
    return " * ".join(terms)


Q_SBG_SQL = f"""
WITH o AS (
    SELECT o_custkey,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS m
    FROM orders),
span AS (
  SELECT o_custkey, MAX(m) - MIN(m) AS last_tenure FROM o GROUP BY o_custkey),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM span),
r AS (
  SELECT tenure, COUNT(*) / CAST(MIN(n0) AS DOUBLE) AS r
  FROM span
  JOIN (SELECT UNNEST([1, 2, {_HORIZON}]) AS tenure) g
    ON last_tenure >= tenure
  CROSS JOIN base
  GROUP BY tenure),
wide AS (
  SELECT LEAST(MAX(CASE WHEN tenure = 1 THEN r END), 0.999999) AS r1,
         LEAST(MAX(CASE WHEN tenure = 2 THEN r END),
               LEAST(MAX(CASE WHEN tenure = 1 THEN r END), 0.999999) - 1e-6)
             AS r2,
         MAX(CASE WHEN tenure = {_HORIZON} THEN r END) AS r12
  FROM r),
ab AS (
  SELECT r1, r2, r12,
         r1 * (r2 - r1) / (r1 * r1 - r2) AS a,
         (r1 * (r2 - r1) / (r1 * r1 - r2)) * r1 / (1.0 - r1) AS b
  FROM wide)
SELECT ROUND(r1, 6) AS r1_observed,
       ROUND(r2, 6) AS r2_observed,
       ROUND(a, 6) AS sbg_a,
       ROUND(b, 6) AS sbg_b,
       ROUND({_proj_sql()}, 6) AS r12_projected,
       ROUND(r12, 6) AS r12_observed
FROM ab
"""

QUERIES["q_sbg_retention_fit"] = QuerySpec(
    q_sbg_retention_fit,
    Q_SBG_SQL,
    "shifted-beta-geometric retention: closed-form moment fit from "
    "r1/r2, 12-month projection vs actual",
)


def q_mean_cumulative_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCF(t): expected cumulative orders per customer through tenure
    month t, with at-risk = customers whose observation window covers
    tenure t (first order at most eval - t)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
    )
    ev = orders.agg(F.max("m").alias("eval_m"))
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("c0"))
    j = (
        orders.join(first, "o_custkey")
        .crossJoin(F.broadcast(ev))
        .select(
            (F.col("m") - F.col("c0")).alias("tenure"),
            (F.col("eval_m") - F.col("c0")).alias("window"),
        )
    )
    events = j.where(F.col("tenure") <= _HORIZON).groupBy("tenure").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    # at-risk per tenure t in 0..HORIZON = # customers with window >= t
    # (evaluated on an explicit tenure grid — the distinct window values
    # need not include small tenures)
    windows = (
        first.crossJoin(F.broadcast(ev))
        .select((F.col("eval_m") - F.col("c0")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    grid = spark.range(_HORIZON + 1).select(F.col("id").alias("tenure"))
    at_risk = (
        grid.join(F.broadcast(windows), F.col("w") >= F.col("tenure"))
        .groupBy("tenure")
        .agg(F.sum("cnt").cast("long").alias("n_risk"))
    )
    per_t = events.join(at_risk, "tenure").select(
        "tenure",
        "d",
        "n_risk",
        F.round(F.col("d") / F.col("n_risk").cast("double"), 12)
        .cast("decimal(38,12)")
        .alias("inc"),
    )
    wt = Window.orderBy("tenure").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_t.withColumn("mcf", F.round(F.sum("inc").over(wt).cast("double"), 6))
        .select("tenure", "d", "n_risk", "mcf")
        .orderBy("tenure")
    )


Q_MCF_SQL = f"""
WITH {_CELLS_SQL},
ev AS (SELECT MAX(m) AS eval_m FROM o),
j AS (
  SELECT m - c0 AS tenure, eval_m - c0 AS window
  FROM o JOIN first_m ON o.o_custkey = first_m.o_custkey CROSS JOIN ev),
events AS (
  SELECT tenure, CAST(COUNT(*) AS BIGINT) AS d
  FROM j WHERE tenure <= {_HORIZON} GROUP BY tenure),
windows AS (
  SELECT eval_m - c0 AS w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM first_m CROSS JOIN ev GROUP BY 1),
at_risk AS (
  SELECT g.tenure, CAST(SUM(cnt) AS BIGINT) AS n_risk
  FROM (SELECT UNNEST(generate_series(0, {_HORIZON})) AS tenure) g
  JOIN windows ON w >= g.tenure
  GROUP BY g.tenure),
per_t AS (
  SELECT events.tenure AS tenure, d, CAST(n_risk AS BIGINT) AS n_risk,
         CAST(ROUND(d / CAST(n_risk AS DOUBLE), 12) AS DECIMAL(38,12)) AS inc
  FROM events JOIN at_risk ON events.tenure = at_risk.tenure)
SELECT tenure, d, n_risk,
       ROUND(CAST(SUM(inc) OVER (ORDER BY tenure ROWS UNBOUNDED PRECEDING)
             AS DOUBLE), 6) AS mcf
FROM per_t ORDER BY tenure
"""

QUERIES["q_mean_cumulative_function"] = QuerySpec(
    q_mean_cumulative_function,
    Q_MCF_SQL,
    "mean cumulative orders per customer by tenure month (recurrent-"
    "event MCF with window-based at-risk) — bounded tenure curve",
)


def q_cohort_quality_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-1 retention per signup cohort + the OLS slope over cohort
    index (are newer cohorts stickier?)."""
    cells = _tenure_cells(spark, sf_dir)
    base = cells.where(F.col("tenure") == 0).select(
        "c0", F.col("n_active").alias("n0")
    )
    m1 = cells.where(F.col("tenure") == 1).select(
        "c0", F.col("n_active").alias("n1")
    )
    ev = cells.agg(F.max("c0").alias("max_c0"))
    per = (
        base.join(m1, "c0", "left")
        .crossJoin(F.broadcast(ev))
        .where(F.col("c0") < F.col("max_c0"))  # month-1 must be observable
        .select(
            "c0",
            (
                F.coalesce("n1", F.lit(0)).cast("double")
                / F.col("n0").cast("double")
            ).alias("r1"),
        )
    )
    first_c = per.agg(F.min("c0").alias("c_min"))
    pts = per.crossJoin(F.broadcast(first_c)).select(
        (F.col("c0") - F.col("c_min")).cast("double").alias("x"), "r1"
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("x", 1).cast("decimal(38,1)")).cast("double").alias("sx"),
        F.sum(F.round("r1", 10).cast("decimal(38,10)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 1).cast("decimal(38,1)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("r1"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nd
    )
    return mom.select(
        F.col("n").alias("n_cohorts"),
        F.round(F.col("sy") / nd, 6).alias("mean_m1_retention"),
        F.round(slope, 8).alias("retention_trend_per_cohort"),
    )


Q_CQT_SQL = f"""
WITH {_CELLS_SQL},
base AS (SELECT c0, n_active AS n0 FROM cells WHERE tenure = 0),
m1 AS (SELECT c0, n_active AS n1 FROM cells WHERE tenure = 1),
ev AS (SELECT MAX(c0) AS max_c0 FROM cells),
per AS (
  SELECT base.c0 AS c0,
         COALESCE(n1, 0) / CAST(n0 AS DOUBLE) AS r1
  FROM base LEFT JOIN m1 ON base.c0 = m1.c0
  CROSS JOIN ev WHERE base.c0 < max_c0),
first_c AS (SELECT MIN(c0) AS c_min FROM per),
pts AS (
  SELECT CAST(c0 - c_min AS DOUBLE) AS x, r1 FROM per CROSS JOIN first_c),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 1) AS DECIMAL(38,1))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(r1, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 1) AS DECIMAL(38,1))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(x * r1, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
  FROM pts)
SELECT n AS n_cohorts,
       ROUND(sy / n, 6) AS mean_m1_retention,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 8)
           AS retention_trend_per_cohort
FROM mom
"""

QUERIES["q_cohort_quality_trend"] = QuerySpec(
    q_cohort_quality_trend,
    Q_CQT_SQL,
    "month-1 retention per cohort with its OLS trend — cohort-month "
    "cells, closed-form slope",
)

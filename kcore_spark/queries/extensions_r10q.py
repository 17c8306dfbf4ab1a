"""Round-10 surface extensions, batch Q (SURVEY §2.3 N r10): the
causal/survival block II — restricted mean survival time (RMST, the
area under the Kaplan-Meier curve up to a horizon: the estimand
clinicians actually report), the Wald instrumental-variable
estimator (reduced-form / first-stage ratio under an md5
instrument), and the parallel-trends diagnostic that must pass
before any difference-in-differences readout is believed.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: RMST composes on the registered q_kaplan_meier curve
(bounded distinct-duration table; segment areas rounded then
decimal-summed); Wald-IV and trend slopes are closed-form from
integer/decimal arm moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8c import Q_KAPLAN_MEIER_SQL, q_kaplan_meier

QUERIES: dict[str, QuerySpec] = {}

RMST_TAU = 60  # days


# ---------------------- restricted mean survival time (RMST)
# Area under the KM step curve up to tau: sum over curve steps of
# S(prev) * (min(dur, tau) - min(prev_dur, tau)), plus the tail
# S(last) * (tau - last_dur) when the curve ends before tau. The
# window runs over the distinct-duration curve (bounded — the
# q_kaplan_meier adjudication).


def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    km = q_kaplan_meier(spark, sf_dir).select("dur", "survival")
    w = Window.orderBy("dur")
    seg = km.select(
        "dur",
        "survival",
        F.coalesce(F.lag("dur").over(w), F.lit(0)).alias("pdur"),
        F.coalesce(F.lag("survival").over(w), F.lit(1.0)).alias("psurv"),
    )
    area = seg.select(
        F.round(
            F.col("psurv")
            * (
                F.least(F.col("dur").cast("double"), F.lit(float(RMST_TAU)))
                - F.least(F.col("pdur").cast("double"), F.lit(float(RMST_TAU)))
            ),
            10,
        )
        .cast("decimal(28,10)")
        .alias("a"),
        "dur",
        "survival",
    )
    tail = km.orderBy(F.col("dur").desc()).limit(1).select(
        F.round(
            F.col("survival")
            * F.greatest(
                F.lit(0.0),
                F.lit(float(RMST_TAU))
                - F.least(F.col("dur").cast("double"), F.lit(float(RMST_TAU))),
            ),
            10,
        )
        .cast("decimal(28,10)")
        .alias("tail_area")
    )
    main = area.agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum("a").alias("step_area"),
    )
    return main.crossJoin(F.broadcast(tail)).select(
        "n_steps",
        F.lit(RMST_TAU).cast("int").alias("tau_days"),
        F.round(
            (F.col("step_area") + F.col("tail_area")).cast("double"), 6
        ).alias("rmst_days"),
    )


Q_RMST_SQL = f"""
WITH km AS ({Q_KAPLAN_MEIER_SQL}),
seg AS (
  SELECT dur, survival,
         COALESCE(LAG(dur) OVER (ORDER BY dur), 0) AS pdur,
         COALESCE(LAG(survival) OVER (ORDER BY dur), 1.0) AS psurv
  FROM km),
area AS (
  SELECT CAST(ROUND(psurv * (LEAST(CAST(dur AS DOUBLE), {RMST_TAU}.0)
                             - LEAST(CAST(pdur AS DOUBLE), {RMST_TAU}.0)), 10)
              AS DECIMAL(28,10)) AS a
  FROM seg),
tail AS (
  SELECT CAST(ROUND(survival * GREATEST(0.0,
              {RMST_TAU}.0 - LEAST(CAST(dur AS DOUBLE), {RMST_TAU}.0)), 10)
              AS DECIMAL(28,10)) AS tail_area
  FROM km ORDER BY dur DESC LIMIT 1)
SELECT CAST((SELECT COUNT(*) FROM area) AS BIGINT) AS n_steps,
       CAST({RMST_TAU} AS INTEGER) AS tau_days,
       ROUND(CAST((SELECT SUM(a) FROM area)
                  + (SELECT ANY_VALUE(tail_area) FROM tail) AS DOUBLE), 6)
         AS rmst_days
"""

QUERIES["q_rmst"] = QuerySpec(
    q_rmst,
    Q_RMST_SQL,
    "restricted mean survival time at tau=60d (area under the "
    "registered KM curve, decimal segment sums) — the reportable "
    "survival estimand",
)


# ------------------------------ Wald instrumental-variable estimator
# Instrument Z = md5 parity of c_custkey ("encouragement"); exposure
# X = customer placed >= 2 orders; outcome Y = customer total spend.
# Wald IV = (E[Y|Z=1] - E[Y|Z=0]) / (E[X|Z=1] - E[X|Z=0]) — the
# just-identified LATE. Arm moments are integer/decimal; the ratio is
# the only double. (With a random instrument the first stage is near
# zero — the F-stat column is the weak-instrument health check, which
# is the POINT of the audit.)


def q_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 2
        ).alias("z"),
    )
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
        )
    )
    base = (
        cust.join(per, "c_custkey", "left")
        .na.fill({"n_orders": 0, "cents": 0})
        .select(
            "z",
            (F.col("n_orders") >= 2).cast("int").alias("x"),
            "cents",
        )
    )
    arms = base.groupBy("z").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("cents").alias("sy"),
    )
    a0 = arms.where(F.col("z") == 0).select(
        F.col("n").alias("n0"), F.col("sx").alias("sx0"), F.col("sy").alias("sy0")
    )
    a1 = arms.where(F.col("z") == 1).select(
        F.col("n").alias("n1"), F.col("sx").alias("sx1"), F.col("sy").alias("sy1")
    )
    j = a0.crossJoin(F.broadcast(a1))
    dy = (
        F.col("sy1").cast("double") / F.col("n1")
        - F.col("sy0").cast("double") / F.col("n0")
    ) / 100.0
    dx = F.col("sx1").cast("double") / F.col("n1") - F.col("sx0").cast(
        "double"
    ) / F.col("n0")
    return j.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(dx, 8).alias("first_stage"),
        F.round(dy, 4).alias("reduced_form"),
        # try_divide: a saturated tiny fixture can have a zero first
        # stage (every customer in both arms >= 2 orders) — the weak-
        # instrument case surfaces as NULL, not an error
        F.round(F.try_divide(dy, dx), 4).alias("wald_iv"),
    )


Q_IV_SQL = """
WITH cust AS (
  SELECT c_custkey,
         ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2
           AS z
  FROM customer),
per AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
base AS (
  SELECT c.z,
         CASE WHEN COALESCE(p.n_orders, 0) >= 2 THEN 1 ELSE 0 END AS x,
         COALESCE(p.cents, 0) AS cents
  FROM cust c LEFT JOIN per p USING (c_custkey)),
arms AS (
  SELECT z, COUNT(*) AS n, SUM(x) AS sx, SUM(cents) AS sy
  FROM base GROUP BY z),
j AS (
  SELECT a0.n AS n0, a0.sx AS sx0, a0.sy AS sy0,
         a1.n AS n1, a1.sx AS sx1, a1.sy AS sy1
  FROM (SELECT * FROM arms WHERE z = 0) a0, (SELECT * FROM arms WHERE z = 1) a1)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0, 8)
         AS first_stage,
       ROUND((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0) / 100.0, 4)
         AS reduced_form,
       ROUND(((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0) / 100.0)
             / NULLIF(CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0, 0),
             4) AS wald_iv
FROM j
"""

QUERIES["q_iv_wald"] = QuerySpec(
    q_iv_wald,
    Q_IV_SQL,
    "Wald instrumental-variable estimator (reduced form / first "
    "stage under the md5 instrument) — the just-identified LATE",
)


# ----------------------------- parallel-trends diagnostic (pre-DiD)
# Split the pre-period (first half of the order window) into months;
# fit per-arm OLS slopes of monthly mean spend on month index; report
# the slope gap — the assumption check difference-in-differences
# rests on. Monthly means are decimal; slopes closed-form over the
# bounded month curve.


def q_parallel_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    bounds = orders.agg(
        F.min("d").alias("lo"),
        F.date_add(
            F.min("d"), F.floor(F.datediff(F.max("d"), F.min("d")) / 2).cast("int")
        ).alias("mid"),
    )
    pre = (
        orders.crossJoin(F.broadcast(bounds))
        .where(F.col("d") <= F.col("mid"))
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
            (
                (F.year("d") - F.year("lo")) * 12 + F.month("d") - F.month("lo")
            ).alias("m"),
            "cents",
        )
    )
    per = pre.groupBy("arm", "m").agg(
        F.round(
            (F.sum("cents") / F.count(F.lit(1))).cast("double") / 100.0, 6
        ).alias("y")
    )
    # moment sums stay integer (m) / decimal (y) so the ~15-point
    # per-arm sums are order-independent; doubles only in the formula
    mom = per.groupBy("arm").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("m").alias("sx"),
        F.sum(F.col("m") * F.col("m")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(18,6)")).alias("sy"),
        F.sum(F.col("m").cast("decimal(12,0)") * F.col("y").cast("decimal(18,6)")).alias("sxy"),
    )
    slope = (
        F.col("k") * F.col("sxy").cast("double")
        - F.col("sx") * F.col("sy").cast("double")
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    s = mom.select("arm", F.round(slope, 6).alias("slope"), F.col("k").cast("long").alias("n_months"))
    s0 = s.where(F.col("arm") == 0).select(
        F.col("slope").alias("slope_control"), F.col("n_months").alias("n_months")
    )
    s1 = s.where(F.col("arm") == 1).select(F.col("slope").alias("slope_treated"))
    return s0.crossJoin(F.broadcast(s1)).select(
        "n_months",
        "slope_control",
        "slope_treated",
        F.round(F.col("slope_treated") - F.col("slope_control"), 6).alias(
            "trend_gap"
        ),
    )


Q_TRENDS_SQL = """
WITH bounds AS (
  SELECT MIN(o_orderdate) AS lo,
         MIN(o_orderdate)
           + CAST(FLOOR(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) / 2)
                  AS INTEGER) * INTERVAL 1 DAY AS mid
  FROM orders),
pre AS (
  SELECT ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2
           AS arm,
         (EXTRACT(year FROM o_orderdate) - EXTRACT(year FROM lo)) * 12
           + EXTRACT(month FROM o_orderdate) - EXTRACT(month FROM lo) AS m,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders, bounds WHERE o_orderdate <= mid),
per AS (
  SELECT arm, m,
         ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6) AS y
  FROM pre GROUP BY arm, m),
mom AS (
  SELECT arm, COUNT(*) AS k,
         SUM(m) AS sx,
         SUM(m * m) AS sxx,
         SUM(CAST(y AS DECIMAL(18,6))) AS sy,
         SUM(CAST(m AS DECIMAL(12,0)) * CAST(y AS DECIMAL(18,6))) AS sxy
  FROM per GROUP BY arm),
s AS (
  SELECT arm, CAST(k AS BIGINT) AS n_months,
         ROUND((k * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
               / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS slope
  FROM mom)
SELECT s0.n_months,
       s0.slope AS slope_control,
       s1.slope AS slope_treated,
       ROUND(s1.slope - s0.slope, 6) AS trend_gap
FROM (SELECT * FROM s WHERE arm = 0) s0, (SELECT * FROM s WHERE arm = 1) s1
"""

QUERIES["q_parallel_trends"] = QuerySpec(
    q_parallel_trends,
    Q_TRENDS_SQL,
    "parallel-trends diagnostic: per-arm pre-period OLS slopes of "
    "monthly mean spend + the gap — the DiD assumption check",
)

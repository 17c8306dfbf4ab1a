"""Round-10 surface extensions, batch CA (SURVEY §2.3 N r10): the
survival block, third wave — the actuarial life table (6-month
intervals with the classic half-censoring exposure adjustment: the
demographer's sibling of q_kaplan_meier), Aalen-Johansen cumulative
incidence (competing risks: which CAUSE removes customers, where
1 - KM would overstate every cause), and a Gompertz hazard fit
(log-linear aging law ln h(t) = ln B + t ln c over monthly hazards —
the classical mortality model, closed-form OLS).

Lifetimes: a customer's span in calendar months from first to last
order. Exits within 3 months of the fixture's last order month are
CENSORED (still active); otherwise the exit's cause is the last
order's status (3 competing causes F/O/P, last order tie-broken by
orderkey — pinned).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all counts integer; survival products via exp(sum(ln p))
with p floored at 1e-12 (pinned guard, same literal both engines);
fractional per-time terms rounded and decimal-summed.
Scale: one orders scan folds to per-customer lifetimes (group-by),
then to the <=79-row month curve; every window after that runs over
that curve (the q_kaplan_meier distinct-event-time adjudication).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_CENSOR_TAIL_M = 3  # exits in the last 3 months are censored
_LT_WIDTH = 6  # life-table interval width (months)
_HORIZONS = [6, 12, 24, 48, 72]


def _lifetimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dur, censored, cause) per customer, plus nothing corpus-sized."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
    )
    per_c = orders.groupBy("o_custkey").agg(
        F.min("m").alias("m0"),
        F.max("m").alias("m1"),
        F.max(
            F.struct(F.col("m"), F.col("o_orderkey"), F.col("o_orderstatus"))
        )["o_orderstatus"].alias("cause_raw"),
    )
    ev = orders.agg(F.max("m").alias("eval_m"))
    return per_c.crossJoin(F.broadcast(ev)).select(
        (F.col("m1") - F.col("m0")).alias("dur"),
        (F.col("m1") > F.col("eval_m") - _CENSOR_TAIL_M).cast("int").alias("cens"),
        F.when(
            F.col("m1") > F.col("eval_m") - _CENSOR_TAIL_M, F.lit("CENSORED")
        )
        .otherwise(F.col("cause_raw"))
        .alias("cause"),
    )


_LIFE_SQL = f"""
  o AS (
    SELECT o_custkey, o_orderkey, o_orderstatus,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS m
    FROM orders),
  per_c AS (
    SELECT o_custkey, m0, m1, cause_raw FROM (
      SELECT o_custkey, o_orderstatus AS cause_raw,
             MIN(m) OVER (PARTITION BY o_custkey) AS m0,
             MAX(m) OVER (PARTITION BY o_custkey) AS m1,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY m DESC, o_orderkey DESC) AS rn
      FROM o)
    WHERE rn = 1),
  ev AS (SELECT MAX(m) AS eval_m FROM o),
  life AS (
    SELECT m1 - m0 AS dur,
           CASE WHEN m1 > eval_m - {_CENSOR_TAIL_M} THEN 1 ELSE 0 END AS cens,
           CASE WHEN m1 > eval_m - {_CENSOR_TAIL_M} THEN 'CENSORED'
                ELSE cause_raw END AS cause
    FROM per_c CROSS JOIN ev)
"""


# ------------------------------------------------------- life table
# 6-month intervals: l_x entering, d_x events, c_x censored,
# exposure n_eff = l_x - c_x/2, q_x = d_x/n_eff, S at interval start.


def q_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    life = _lifetimes(spark, sf_dir)
    iv = life.groupBy(F.floor(F.col("dur") / _LT_WIDTH).cast("long").alias("x")).agg(
        F.sum(1 - F.col("cens")).cast("long").alias("d_x"),
        F.sum("cens").cast("long").alias("c_x"),
    )
    w_suffix = Window.orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lt = iv.withColumn(
        "l_x", F.sum(F.col("d_x") + F.col("c_x")).over(w_suffix)
    )
    n_eff = F.col("l_x").cast("double") - F.col("c_x").cast("double") / 2.0
    q_x = F.col("d_x").cast("double") / n_eff
    lt2 = lt.select(
        "x",
        "l_x",
        "d_x",
        "c_x",
        F.round(q_x, 6).alias("q_x"),
        F.log(F.greatest(1.0 - q_x, F.lit(1e-12))).alias("lnp"),
    )
    w_prev = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    return lt2.select(
        (F.col("x") * _LT_WIDTH).alias("age_months"),
        "l_x",
        "d_x",
        "c_x",
        "q_x",
        F.round(
            F.exp(F.coalesce(F.sum("lnp").over(w_prev), F.lit(0.0))), 6
        ).alias("s_start"),
    ).orderBy("age_months")


Q_LT_SQL = f"""
WITH {_LIFE_SQL},
iv AS (
  SELECT CAST(FLOOR(dur / {_LT_WIDTH}.0) AS BIGINT) AS x,
         CAST(SUM(1 - cens) AS BIGINT) AS d_x,
         CAST(SUM(cens) AS BIGINT) AS c_x
  FROM life GROUP BY 1),
lt AS (
  SELECT x, d_x, c_x,
         SUM(d_x + c_x) OVER (ORDER BY x DESC ROWS UNBOUNDED PRECEDING) AS l_x
  FROM iv),
lt2 AS (
  SELECT x, l_x, d_x, c_x,
         ROUND(d_x / (CAST(l_x AS DOUBLE) - CAST(c_x AS DOUBLE) / 2.0), 6) AS q_x,
         LN(GREATEST(1.0 - d_x / (CAST(l_x AS DOUBLE)
                                  - CAST(c_x AS DOUBLE) / 2.0), 1e-12)) AS lnp
  FROM lt)
SELECT x * {_LT_WIDTH} AS age_months, CAST(l_x AS BIGINT) AS l_x, d_x, c_x, q_x,
       ROUND(EXP(COALESCE(SUM(lnp) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)), 6)
           AS s_start
FROM lt2 ORDER BY age_months
"""

QUERIES["q_life_table"] = QuerySpec(
    q_life_table,
    Q_LT_SQL,
    "actuarial life table (6-month intervals, half-censoring exposure) "
    "over customer order-span lifetimes — bounded interval curve",
)


# ---------------------------------------- Aalen-Johansen incidence
# CIF_k(t) = sum_{s<=t} S(s-) d_k(s) / n(s), S = all-cause KM.


def q_cumulative_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    life = _lifetimes(spark, sf_dir)
    months = life.groupBy(F.col("dur").alias("t")).agg(
        F.sum(1 - F.col("cens")).cast("long").alias("d_t"),
        F.sum("cens").cast("long").alias("c_t"),
    )
    w_suffix = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    km = (
        months.withColumn("n_t", F.sum(F.col("d_t") + F.col("c_t")).over(w_suffix))
        .withColumn(
            "lnp",
            F.log(
                F.greatest(
                    1.0 - F.col("d_t").cast("double") / F.col("n_t"),
                    F.lit(1e-12),
                )
            ),
        )
        .withColumn(
            "s_prev", F.exp(F.coalesce(F.sum("lnp").over(w_prev), F.lit(0.0)))
        )
        .select("t", "n_t", "s_prev")
    )
    causes = (
        life.where(F.col("cens") == 0)
        .groupBy(F.col("dur").alias("t"), "cause")
        .agg(F.count(F.lit(1)).cast("long").alias("d_k"))
    )
    steps = causes.join(km, "t").select(
        "t",
        "cause",
        F.round(
            F.col("s_prev") * F.col("d_k").cast("double") / F.col("n_t"), 12
        )
        .cast("decimal(38,12)")
        .alias("step"),
    )
    grid = F.array(*[F.lit(h) for h in _HORIZONS])
    fan = steps.select("t", "cause", "step", F.explode(grid).alias("h")).where(
        F.col("t") <= F.col("h")
    )
    return (
        fan.groupBy("h", "cause")
        .agg(F.round(F.sum("step").cast("double"), 6).alias("cif"))
        .select(F.col("h").alias("horizon_months"), "cause", "cif")
        .orderBy("horizon_months", "cause")
    )


Q_CIF_SQL = f"""
WITH {_LIFE_SQL},
months AS (
  SELECT dur AS t,
         CAST(SUM(1 - cens) AS BIGINT) AS d_t,
         CAST(SUM(cens) AS BIGINT) AS c_t
  FROM life GROUP BY 1),
km AS (
  SELECT t, n_t,
         EXP(COALESCE(SUM(LN(GREATEST(1.0 - d_t / CAST(n_t AS DOUBLE), 1e-12)))
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0.0)) AS s_prev
  FROM (
    SELECT t, d_t,
           SUM(d_t + c_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_t
    FROM months)),
causes AS (
  SELECT dur AS t, cause, CAST(COUNT(*) AS BIGINT) AS d_k
  FROM life WHERE cens = 0 GROUP BY 1, 2),
steps AS (
  SELECT causes.t, cause,
         CAST(ROUND(s_prev * d_k / CAST(n_t AS DOUBLE), 12)
              AS DECIMAL(38,12)) AS step
  FROM causes JOIN km ON causes.t = km.t),
fan AS (
  SELECT h, cause, step
  FROM steps
  CROSS JOIN (SELECT UNNEST([{", ".join(str(h) for h in _HORIZONS)}]) AS h) g
  WHERE t <= h)
SELECT h AS horizon_months, cause,
       ROUND(CAST(SUM(step) AS DOUBLE), 6) AS cif
FROM fan GROUP BY 1, 2 ORDER BY horizon_months, cause
"""

QUERIES["q_cumulative_incidence"] = QuerySpec(
    q_cumulative_incidence,
    Q_CIF_SQL,
    "Aalen-Johansen cumulative incidence of the three competing exit "
    "causes at pinned horizons — KM prefix over the month curve",
)


# ----------------------------------------------------- Gompertz fit
# Monthly hazards h_m = d_m / (l_m - c_m/2); OLS of ln h on m:
# ln h = ln B + m ln c  =>  aging rate c = exp(slope).


def q_gompertz_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    life = _lifetimes(spark, sf_dir)
    months = life.groupBy(F.col("dur").alias("t")).agg(
        F.sum(1 - F.col("cens")).cast("long").alias("d_t"),
        F.sum("cens").cast("long").alias("c_t"),
    )
    w_suffix = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hz = months.withColumn(
        "n_t", F.sum(F.col("d_t") + F.col("c_t")).over(w_suffix)
    ).select(
        "t",
        (
            F.col("d_t").cast("double")
            / (F.col("n_t").cast("double") - F.col("c_t").cast("double") / 2.0)
        ).alias("h"),
    )
    pts = hz.where((F.col("h") > 0) & (F.col("h") < 1)).select(
        F.col("t").cast("double").alias("x"), F.log("h").alias("y")
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("x", 6).cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum(F.round("y", 10).cast("decimal(38,10)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.round(F.col("x") * F.col("y"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / nd
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / nd
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / nd
    slope = sxy_c / sxx_c
    return mom.select(
        F.col("n").alias("n_points"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 6).alias("ln_b"),
        F.round(F.exp(slope), 6).alias("aging_rate_c"),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    )


Q_GOMPERTZ_SQL = f"""
WITH {_LIFE_SQL},
months AS (
  SELECT dur AS t,
         CAST(SUM(1 - cens) AS BIGINT) AS d_t,
         CAST(SUM(cens) AS BIGINT) AS c_t
  FROM life GROUP BY 1),
hz AS (
  SELECT t,
         d_t / (CAST(n_t AS DOUBLE) - CAST(c_t AS DOUBLE) / 2.0) AS h
  FROM (
    SELECT t, d_t, c_t,
           SUM(d_t + c_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_t
    FROM months)),
pts AS (
  SELECT CAST(t AS DOUBLE) AS x, LN(h) AS y FROM hz WHERE h > 0 AND h < 1),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(y * y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(ROUND(x * y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
  FROM pts)
SELECT n AS n_points,
       ROUND((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, 6)
           AS ln_b,
       ROUND(EXP((sxy - sx * sy / n) / (sxx - sx * sx / n)), 6) AS aging_rate_c,
       ROUND((sxy - sx * sy / n) * (sxy - sx * sy / n)
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
FROM mom
"""

QUERIES["q_gompertz_fit"] = QuerySpec(
    q_gompertz_fit,
    Q_GOMPERTZ_SQL,
    "Gompertz aging-law fit: log-linear OLS of monthly hazards over the "
    "lifetime curve — closed-form moments, half-censoring exposure",
)

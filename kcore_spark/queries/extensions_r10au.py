"""Round-10 surface extensions, batch AU (SURVEY §2.3 N r10): the
survey-sampling estimator block, each measured against the exact
population total it estimates — Horvitz-Thompson (unequal-probability
inclusion, the π-weighted workhorse), the ratio estimator (auxiliary
variable with known population total), and the regression estimator
(the GREG special case). Completes the sampling family next to
q_neyman_allocation, q_raking_ipf and q_stratified_sample.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: sample membership and inclusion probabilities are
md5-pinned per order; totals are decimal-exact sums; weighted sums
are ROUND-pinned decimals.
Scale: one orders×lineitem-count rollup feeds all three; each
estimator is a filtered moment agg plus a 1-row exact-total
broadcast. Nothing sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population frame: y = order value, x = line count (auxiliary),
    u = pinned uniform in [0,1)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("x")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / 4294967296.0
    )
    return orders.join(lines, "o_orderkey").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(15,2)").alias("y"),
        F.col("x").cast("long").alias("x"),
        u.alias("u"),
    )


_POP_SQL = """
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(15,2)) AS y,
         CAST(x AS BIGINT) AS x,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
         / 4294967296.0 AS u
  FROM orders JOIN (
    SELECT l_orderkey AS o_orderkey, COUNT(*) AS x FROM lineitem GROUP BY 1) t
  USING (o_orderkey)
"""


# ------------------------------------------------ Horvitz-Thompson
# π_i = LEAST(1, x_i/20) (size-proportional, clamped); include when
# u < π. t̂_HT = Σ_s y_i/π_i vs the exact Σ y.


def q_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    pop = _pop(spark, sf_dir)
    pi = F.least(F.lit(1.0), F.col("x").cast("double") / 20.0)
    exact = pop.agg(
        F.sum("y").cast("double").alias("t_exact"),
        F.count(F.lit(1)).cast("long").alias("n_pop"),
    )
    est = pop.where(F.col("u") < pi).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sum(
            F.round(F.col("y").cast("double") / pi, 4).cast("decimal(28,4)")
        ).cast("double").alias("t_ht"),
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_pop",
        "n_sample",
        F.round("t_ht", 2).alias("ht_estimate"),
        F.round("t_exact", 2).alias("exact_total"),
        F.round(F.col("t_ht") / F.col("t_exact"), 6).alias("est_over_exact"),
    )


Q_HT_SQL = f"""
WITH pop AS ({_POP_SQL}),
exact AS (SELECT CAST(SUM(y) AS DOUBLE) AS t_exact,
                 CAST(COUNT(*) AS BIGINT) AS n_pop FROM pop),
est AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
         CAST(SUM(CAST(ROUND(CAST(y AS DOUBLE)
                             / LEAST(1.0, CAST(x AS DOUBLE) / 20.0), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) AS t_ht
  FROM pop WHERE u < LEAST(1.0, CAST(x AS DOUBLE) / 20.0))
SELECT n_pop, n_sample,
       ROUND(t_ht, 2) AS ht_estimate,
       ROUND(t_exact, 2) AS exact_total,
       ROUND(t_ht / t_exact, 6) AS est_over_exact
FROM est CROSS JOIN exact
"""

QUERIES["q_horvitz_thompson"] = QuerySpec(
    q_horvitz_thompson,
    Q_HT_SQL,
    "Horvitz-Thompson total under size-proportional inclusion vs the "
    "exact total — pinned π, decimal-pinned weighted sum",
)


# --------------------------------------------------- ratio estimator
# 10% equal-probability sample; t̂_ratio = (Σ_s y / Σ_s x) · X_pop.


def q_ratio_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    pop = _pop(spark, sf_dir)
    exact = pop.agg(
        F.sum("y").cast("double").alias("t_exact"),
        F.sum("x").cast("double").alias("x_pop"),
    )
    s = pop.where(F.col("u") < 0.1).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("x").cast("double").alias("sx"),
    )
    est = F.col("sy") / F.col("sx") * F.col("x_pop")
    return s.crossJoin(F.broadcast(exact)).select(
        "n_sample",
        F.round(est, 2).alias("ratio_estimate"),
        F.round("t_exact", 2).alias("exact_total"),
        F.round(est / F.col("t_exact"), 6).alias("est_over_exact"),
    )


Q_RATIO_SQL = f"""
WITH pop AS ({_POP_SQL}),
exact AS (SELECT CAST(SUM(y) AS DOUBLE) AS t_exact,
                 CAST(SUM(x) AS DOUBLE) AS x_pop FROM pop),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
         CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(x) AS DOUBLE) AS sx
  FROM pop WHERE u < 0.1)
SELECT n_sample,
       ROUND(sy / sx * x_pop, 2) AS ratio_estimate,
       ROUND(t_exact, 2) AS exact_total,
       ROUND(sy / sx * x_pop / t_exact, 6) AS est_over_exact
FROM s CROSS JOIN exact
"""

QUERIES["q_ratio_estimator"] = QuerySpec(
    q_ratio_estimator,
    Q_RATIO_SQL,
    "ratio estimator of the value total from a 10% pinned sample "
    "with known auxiliary total",
)


# ---------------------------------------------- regression estimator
# t̂_reg = N·(ȳ_s + b·(X̄_pop − x̄_s)) with b the sample OLS slope.


def q_regression_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    pop = _pop(spark, sf_dir)
    exact = pop.agg(
        F.sum("y").cast("double").alias("t_exact"),
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("xbar_pop"),
    )
    s = pop.where(F.col("u") < 0.1).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("y").alias("sy"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y") * F.col("x")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    md = F.col("m").cast("double")
    sy, sx = F.col("sy").cast("double"), F.col("sx").cast("double")
    b = (md * F.col("sxy").cast("double") - sx * sy) / (
        md * F.col("sxx").cast("double") - sx * sx
    )
    est = F.col("n_pop").cast("double") * (
        sy / md + b * (F.col("xbar_pop") - sx / md)
    )
    return s.crossJoin(F.broadcast(exact)).select(
        F.col("m").alias("n_sample"),
        F.round(b, 6).alias("slope"),
        F.round(est, 2).alias("reg_estimate"),
        F.round("t_exact", 2).alias("exact_total"),
        F.round(est / F.col("t_exact"), 6).alias("est_over_exact"),
    )


Q_REG_SQL = f"""
WITH pop AS ({_POP_SQL}),
exact AS (SELECT CAST(SUM(y) AS DOUBLE) AS t_exact,
                 CAST(COUNT(*) AS BIGINT) AS n_pop,
                 CAST(SUM(x) AS DOUBLE) / COUNT(*) AS xbar_pop FROM pop),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, SUM(y) AS sy, SUM(x) AS sx,
         SUM(y * x) AS sxy, SUM(x * x) AS sxx
  FROM pop WHERE u < 0.1)
SELECT m AS n_sample,
       ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND(CAST(n_pop AS DOUBLE)
             * (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)
                + (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (xbar_pop - CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))), 2)
           AS reg_estimate,
       ROUND(t_exact, 2) AS exact_total,
       ROUND(CAST(n_pop AS DOUBLE)
             * (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)
                + (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (xbar_pop - CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)))
             / t_exact, 6) AS est_over_exact
FROM s CROSS JOIN exact
"""

QUERIES["q_regression_estimator"] = QuerySpec(
    q_regression_estimator,
    Q_REG_SQL,
    "survey regression (GREG) estimator of the value total from a "
    "10% pinned sample — sample OLS slope, known auxiliary mean",
)

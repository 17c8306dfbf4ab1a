"""Round-10 surface extensions, batch BM (SURVEY §2.3 N r10): the
causal II block — segment-level uplift (T-learner difference of
conversion rates under the pinned arm split; the heterogeneity table
next to q_diff_in_diff), mediation analysis (Baron-Kenny product of
coefficients: x→m path times m→y|x path, with the direct and total
effects for the decomposition identity), and a dose-response table
(discount bands → return rate; the monotonicity read behind
q_discount_response's elasticity).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: md5-pinned arms; integer conversion counts; mediation
coefficients from decimal-exact order-level moments via the centered
normal equations (the q_ols_two_features idiom).
Scale: one customer/order-keyed rollup each; k-row outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------- uplift by segment


def q_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    conv = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 0
    )
    units = cust.join(conv, "c_custkey", "left").select(
        "c_mktsegment",
        arm.alias("treated"),
        F.coalesce("conv", F.lit(0)).alias("c"),
    )
    agg = units.groupBy("c_mktsegment").agg(
        F.sum(F.col("treated").cast("long")).alias("n_t"),
        F.sum((~F.col("treated")).cast("long")).alias("n_c"),
        F.sum(F.when(F.col("treated"), F.col("c")).otherwise(0)).alias("s_t"),
        F.sum(F.when(~F.col("treated"), F.col("c")).otherwise(0)).alias("s_c"),
    )
    pt = F.col("s_t").cast("double") / F.col("n_t").cast("double")
    pc = F.col("s_c").cast("double") / F.col("n_c").cast("double")
    return agg.select(
        "c_mktsegment",
        F.col("n_t").cast("long").alias("n_treated"),
        F.col("n_c").cast("long").alias("n_control"),
        F.round(pt, 6).alias("p_treated"),
        F.round(pc, 6).alias("p_control"),
        F.round(pt - pc, 6).alias("uplift"),
    ).orderBy("c_mktsegment")


Q_UPLIFT_SQL = """
WITH conv AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'),
units AS (
  SELECT c_mktsegment,
         ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
             AS treated,
         CASE WHEN conv.c_custkey IS NULL THEN 0 ELSE 1 END AS c
  FROM customer LEFT JOIN conv USING (c_custkey)),
agg AS (
  SELECT c_mktsegment,
         CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         SUM(CASE WHEN treated THEN c ELSE 0 END) AS s_t,
         SUM(CASE WHEN NOT treated THEN c ELSE 0 END) AS s_c
  FROM units GROUP BY c_mktsegment)
SELECT c_mktsegment, n_t AS n_treated, n_c AS n_control,
       ROUND(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE), 6) AS p_treated,
       ROUND(CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS p_control,
       ROUND(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
             - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) AS uplift
FROM agg
ORDER BY c_mktsegment
"""

QUERIES["q_uplift_by_segment"] = QuerySpec(
    q_uplift_by_segment,
    Q_UPLIFT_SQL,
    "T-learner uplift per segment under the pinned arm split — "
    "integer conversion counts, k-row output",
)


# ---------------------------------------------------- mediation paths
# Order level: x = line count, m = total quantity, y = total price/1e3.
# a: slope of m~x. (b, c'): two-feature fit y~x+m. c: slope of y~x.
# Identity: c = c' + a·b (exact for OLS — the hash pins the algebra).


def q_mediation_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.sum(F.col("l_quantity").cast("decimal(15,2)"))
        .cast("double")
        .alias("m"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)")).cast("double")
            / 1000.0
        ).alias("y"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("x"), 2).cast("decimal(28,2)")).alias("sx"),
        F.sum(F.round(F.col("m"), 2).cast("decimal(28,2)")).alias("sm"),
        F.sum(F.round(F.col("y"), 6).cast("decimal(28,6)")).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 4).cast("decimal(38,4)")).alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("m"), 4).cast("decimal(38,4)")).alias("sxm"),
        F.sum(F.round(F.col("m") * F.col("m"), 4).cast("decimal(38,4)")).alias("smm"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(38,4)")).alias("sxy"),
        F.sum(F.round(F.col("m") * F.col("y"), 4).cast("decimal(38,4)")).alias("smy"),
    )
    n = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") ** 2 / n
    cxm = (
        F.col("sxm").cast("double")
        - F.col("sx").cast("double") * F.col("sm").cast("double") / n
    )
    cmm = F.col("smm").cast("double") - F.col("sm").cast("double") ** 2 / n
    cxy = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double") / n
    )
    cmy = (
        F.col("smy").cast("double")
        - F.col("sm").cast("double") * F.col("sy").cast("double") / n
    )
    a = cxm / cxx
    det = cxx * cmm - cxm * cxm
    c_prime = (cxy * cmm - cmy * cxm) / det
    b = (cmy * cxx - cxy * cxm) / det
    c_total = cxy / cxx
    return mom.select(
        "n",
        F.round(a, 6).alias("path_a"),
        F.round(b, 6).alias("path_b"),
        F.round(c_prime, 6).alias("direct_effect"),
        F.round(a * b, 6).alias("indirect_effect"),
        F.round(c_total, 6).alias("total_effect"),
    )


Q_MEDIATION_SQL = """
WITH base AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS x,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS m,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / 1000.0 AS y
  FROM lineitem GROUP BY l_orderkey),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(m, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(x * m, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxm,
         CAST(SUM(CAST(ROUND(m * m, 4) AS DECIMAL(38,4))) AS DOUBLE) AS smm,
         CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(m * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS smy
  FROM base),
c AS (
  SELECT n,
         (sxm - sx * sm / n) / (sxx - sx * sx / n) AS a,
         ((smy - sm * sy / n) * (sxx - sx * sx / n)
          - (sxy - sx * sy / n) * (sxm - sx * sm / n))
         / ((sxx - sx * sx / n) * (smm - sm * sm / n)
            - (sxm - sx * sm / n) * (sxm - sx * sm / n)) AS b,
         ((sxy - sx * sy / n) * (smm - sm * sm / n)
          - (smy - sm * sy / n) * (sxm - sx * sm / n))
         / ((sxx - sx * sx / n) * (smm - sm * sm / n)
            - (sxm - sx * sm / n) * (sxm - sx * sm / n)) AS c_prime,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS c_total
  FROM mom)
SELECT n,
       ROUND(a, 6) AS path_a,
       ROUND(b, 6) AS path_b,
       ROUND(c_prime, 6) AS direct_effect,
       ROUND(a * b, 6) AS indirect_effect,
       ROUND(c_total, 6) AS total_effect
FROM c
"""

QUERIES["q_mediation_paths"] = QuerySpec(
    q_mediation_paths,
    Q_MEDIATION_SQL,
    "Baron-Kenny mediation decomposition (a·b + c' = c) from one "
    "order-level moment pass",
)


# ------------------------------------------------------ dose-response


def q_dose_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    band = F.least(F.lit(4), F.floor(F.col("l_discount") / 0.02)).cast("long")
    agg = li.groupBy(band.alias("discount_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("returns"),
        (
            F.sum(F.col("l_quantity").cast("decimal(15,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty"),
    )
    return agg.select(
        "discount_band",
        "n",
        F.round(
            F.col("returns").cast("double") / F.col("n").cast("double"), 6
        ).alias("return_rate"),
        F.round("avg_qty", 6).alias("avg_qty"),
    ).orderBy("discount_band")


Q_DOSE_SQL = """
SELECT LEAST(4, CAST(FLOOR(l_discount / 0.02) AS BIGINT)) AS discount_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS return_rate,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*), 6)
           AS avg_qty
FROM lineitem
GROUP BY 1
ORDER BY discount_band
"""

QUERIES["q_dose_response"] = QuerySpec(
    q_dose_response,
    Q_DOSE_SQL,
    "discount-band dose-response table (return rate, avg quantity) — "
    "one grouped scan",
)

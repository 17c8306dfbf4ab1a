"""Round-10 surface extensions, batch BD (SURVEY §2.3 N r10): the
shrinkage/privacy block — the James-Stein estimator (segment means
shrunk toward the grand mean by the positive-part factor; the
textbook "never worse in aggregate" estimator), empirical-Bayes
return rates (beta-binomial moment matching, per-brand posterior
rates — the small-sample stabilizer next to q_return_rate_wilson),
and randomized response (Warner's privacy mechanism with md5-pinned
coin flips and the unbiased de-bias step — completes the privacy
family next to q_dp_noisy_counts / q_k_anonymity).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal-exact group sums; md5-pinned coin flips; all
shrinkage algebra in closed form over k-row group tables.
Scale: one keyed rollup each; everything downstream is k-row with
1-row broadcast crosses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------------------------------- James-Stein
# Segment means m_i; positive-part JS toward the grand mean with the
# pooled per-mean variance: f = max(0, 1 − (k−3)·v̄/Σ(m_i−m̄)²),
# v̄ = pooled within-variance / harmonic-ish per-group n (we use the
# pooled σ² over the mean group size — the classic equal-variance
# form, documented).


def q_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", F.col("o_totalprice").cast("decimal(15,2)").alias("y"))
    g = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    per = g.select("c_mktsegment", "n", mean.alias("m"), "s1", "s2")
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("s1")).cast("double").alias("sy"),
        F.sum(F.col("s2")).cast("double").alias("syy"),
        F.sum("n").cast("double").alias("ntot"),
        F.sum(F.round(F.col("m"), 9).cast("decimal(28,9)"))
        .cast("double")
        .alias("sm"),
        F.sum(
            F.round(F.col("m") * F.col("m"), 6).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("smm"),
    )
    j = per.crossJoin(F.broadcast(tot))
    grand = F.col("sm") / F.col("k").cast("double")
    ssd = F.col("smm") - F.col("sm") ** 2 / F.col("k").cast("double")
    pooled_var = (F.col("syy") - F.col("sy") ** 2 / F.col("ntot")) / (
        F.col("ntot") - F.col("k")
    )
    vbar = pooled_var / (F.col("ntot") / F.col("k").cast("double"))
    f = F.greatest(
        F.lit(0.0), 1.0 - (F.col("k") - 3).cast("double") * vbar / ssd
    )
    return j.select(
        "c_mktsegment",
        "n",
        F.round(F.col("m"), 6).alias("raw_mean"),
        F.round(f, 6).alias("shrink_factor"),
        F.round(grand + f * (F.col("m") - grand), 6).alias("js_mean"),
    ).orderBy("c_mktsegment")


Q_JS_SQL = """
WITH base AS (
  SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(15,2)) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
g AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(y) AS s1, SUM(y * y) AS s2
  FROM base GROUP BY 1),
per AS (
  SELECT c_mktsegment, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m, s1, s2
  FROM g),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s1) AS DOUBLE) AS sy, CAST(SUM(s2) AS DOUBLE) AS syy,
         CAST(SUM(n) AS DOUBLE) AS ntot,
         CAST(SUM(CAST(ROUND(m, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(ROUND(m * m, 6) AS DECIMAL(28,6))) AS DOUBLE) AS smm
  FROM per)
SELECT c_mktsegment, n,
       ROUND(m, 6) AS raw_mean,
       ROUND(GREATEST(0.0,
             1.0 - CAST(k - 3 AS DOUBLE)
                   * ((syy - sy * sy / ntot) / (ntot - k)) / (ntot / CAST(k AS DOUBLE))
                   / (smm - sm * sm / CAST(k AS DOUBLE))), 6) AS shrink_factor,
       ROUND(sm / CAST(k AS DOUBLE)
             + GREATEST(0.0,
               1.0 - CAST(k - 3 AS DOUBLE)
                     * ((syy - sy * sy / ntot) / (ntot - k)) / (ntot / CAST(k AS DOUBLE))
                     / (smm - sm * sm / CAST(k AS DOUBLE)))
               * (m - sm / CAST(k AS DOUBLE)), 6) AS js_mean
FROM per CROSS JOIN tot
ORDER BY c_mktsegment
"""

QUERIES["q_james_stein"] = QuerySpec(
    q_james_stein,
    Q_JS_SQL,
    "positive-part James-Stein shrinkage of segment means — pooled "
    "variance, k-row algebra",
)


# ------------------------------------------- empirical-Bayes rates
# Per-brand return rate; beta-binomial moments from the rate spread:
#   m = mean(r_i), v = var(r_i); c = m(1−m)/v − 1 (clamped ≥ 1);
#   α = m·c, β = (1−m)·c; EB rate = (x_i + α)/(n_i + α + β).


def q_empirical_bayes_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("x"),
        )
    )
    r = F.round(F.col("x").cast("double") / F.col("n").cast("double"), 9)
    per = g.select("p_brand", "n", "x", r.alias("r"))
    mom = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("r").cast("decimal(18,9)")).cast("double").alias("sr"),
        F.sum(
            F.round(F.col("r") * F.col("r"), 12).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("srr"),
    )
    kd = F.col("k").cast("double")
    m = F.col("sr") / kd
    v = (F.col("srr") - F.col("sr") ** 2 / kd) / (kd - 1)
    c = F.greatest(F.lit(1.0), m * (1.0 - m) / v - 1.0)
    params = mom.select(
        F.round(m * c, 9).alias("alpha"), F.round((1.0 - m) * c, 9).alias("beta")
    )
    j = per.crossJoin(F.broadcast(params))
    return j.select(
        "p_brand",
        "n",
        F.round("r", 6).alias("raw_rate"),
        F.round(
            (F.col("x").cast("double") + F.col("alpha"))
            / (F.col("n").cast("double") + F.col("alpha") + F.col("beta")),
            6,
        ).alias("eb_rate"),
    ).orderBy("p_brand")


Q_EB_SQL = """
WITH g AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1),
per AS (
  SELECT p_brand, n, x,
         ROUND(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 9) AS r
  FROM g),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) AS sr,
         CAST(SUM(CAST(ROUND(r * r, 12) AS DECIMAL(28,12))) AS DOUBLE) AS srr
  FROM per),
params AS (
  SELECT ROUND((sr / k)
               * GREATEST(1.0, (sr / k) * (1.0 - sr / k)
                               / ((srr - sr * sr / k) / (k - 1)) - 1.0), 9) AS alpha,
         ROUND((1.0 - sr / k)
               * GREATEST(1.0, (sr / k) * (1.0 - sr / k)
                               / ((srr - sr * sr / k) / (k - 1)) - 1.0), 9) AS beta
  FROM mom)
SELECT p_brand, n,
       ROUND(r, 6) AS raw_rate,
       ROUND((CAST(x AS DOUBLE) + alpha)
             / (CAST(n AS DOUBLE) + alpha + beta), 6) AS eb_rate
FROM per CROSS JOIN params
ORDER BY p_brand
"""

QUERIES["q_empirical_bayes_rates"] = QuerySpec(
    q_empirical_bayes_rates,
    Q_EB_SQL,
    "empirical-Bayes (beta-binomial) shrunk return rates per brand — "
    "moment-matched prior, k-row algebra",
)


# ------------------------------------------------ randomized response
# Warner's mechanism: report the truth w.p. 0.75, the opposite w.p.
# 0.25 (md5-pinned coin). Debias: p̂ = (p_obs − 0.25)/0.5. The row
# reports true, observed, and debiased rates side by side.


def q_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    truth = (F.col("o_orderstatus") == "F").cast("int")
    coin = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 4
        == 0
    )
    reported = F.when(coin, 1 - truth).otherwise(truth)
    agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(truth).cast("long").alias("n_true"),
        F.sum(reported).cast("long").alias("n_reported"),
    )
    p_obs = F.col("n_reported").cast("double") / F.col("n").cast("double")
    return agg.select(
        "n",
        F.round(
            F.col("n_true").cast("double") / F.col("n").cast("double"), 6
        ).alias("true_rate"),
        F.round(p_obs, 6).alias("observed_rate"),
        F.round((p_obs - 0.25) / 0.5, 6).alias("debiased_rate"),
    )


Q_RR_SQL = """
WITH src AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS t,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 4 = 0
             AS coin
  FROM orders),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN coin THEN 1 - t ELSE t END) AS BIGINT) AS n_reported
  FROM src)
SELECT n,
       ROUND(CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE), 6) AS true_rate,
       ROUND(CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE), 6) AS observed_rate,
       ROUND((CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE) - 0.25) / 0.5, 6)
           AS debiased_rate
FROM agg
"""

QUERIES["q_randomized_response"] = QuerySpec(
    q_randomized_response,
    Q_RR_SQL,
    "Warner randomized response with pinned coins + unbiased "
    "de-bias — one scan, integer counts",
)

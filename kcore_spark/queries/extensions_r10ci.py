"""Round-10 surface extensions, batch CI (SURVEY §2.3 N r10): the
survey-design block, second wave — the one-way-ANOVA intraclass
correlation with its design effect (how much does clustering customers
by nation inflate the variance of a mean, deff = 1 + (m_bar - 1) rho)
and the cluster-adjusted effective sample size; the Kish effective n
for unequal WEIGHTS (n_eff = (sum w)^2 / sum w^2 — the first number a
weighted-survey analyst reports); and a weight-trimming impact report
(cap weights at 3x the mean: how much variance do we buy back, and how
much does the weighted mean move?). Completes the survey family next
to q_horvitz_thompson / q_neyman_allocation / q_post_stratification.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all moments are cents-decimal or rounded-decimal sums;
ANOVA mean squares use the standard unequal-cluster-size a_0
correction with pinned op order.
Scale: every statistic folds one scan to per-cluster moments (25
nations) or 1-row weight moments — group-bys only, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_TRIM_MULT = 3.0  # weight cap at 3x mean weight


def q_icc_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1) from one-way ANOVA of customer spend by nation cluster,
    with deff and cluster-adjusted effective n."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("cents")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    x = spend.join(cust, spend.o_custkey == cust.c_custkey).select(
        "c_nationkey", (F.col("cents").cast("double") / 100.0).alias("x")
    )
    per = x.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("m_i"),
        F.sum(F.round("x", 2).cast("decimal(38,2)")).cast("double").alias("s_i"),
        F.sum(F.round(F.col("x") * F.col("x"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("ss_i"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("m_i").cast("long").alias("n"),
        F.sum(F.col("m_i") * F.col("m_i")).cast("long").alias("sm2"),
        F.sum(F.round("s_i", 2).cast("decimal(38,2)")).cast("double").alias("s"),
        F.sum(F.round("ss_i", 2).cast("decimal(38,2)")).cast("double").alias("ss"),
        F.sum(
            F.round(F.col("s_i") * F.col("s_i") / F.col("m_i"), 6)
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("sbg"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ss_total = F.col("ss") - F.col("s") * F.col("s") / nd
    ss_between = F.col("sbg") - F.col("s") * F.col("s") / nd
    ss_within = ss_total - ss_between
    msb = ss_between / (kd - 1.0)
    msw = ss_within / (nd - kd)
    a0 = (nd - F.col("sm2").cast("double") / nd) / (kd - 1.0)
    icc = (msb - msw) / (msb + (a0 - 1.0) * msw)
    mbar = nd / kd
    deff = 1.0 + (mbar - 1.0) * icc
    return agg.select(
        F.col("k").alias("n_clusters"),
        F.col("n").alias("n_units"),
        F.round(icc, 6).alias("icc"),
        F.round(deff, 6).alias("deff"),
        F.round(nd / deff, 2).alias("n_effective"),
    )


Q_ICC_SQL = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY o_custkey),
x AS (
  SELECT c_nationkey, CAST(cents AS DOUBLE) / 100.0 AS x
  FROM spend JOIN customer ON o_custkey = c_custkey),
per AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS m_i,
         CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2))) AS DOUBLE) AS s_i,
         CAST(SUM(CAST(ROUND(x * x, 2) AS DECIMAL(38,2))) AS DOUBLE) AS ss_i
  FROM x GROUP BY 1),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(m_i) AS BIGINT) AS n,
         CAST(SUM(m_i * m_i) AS BIGINT) AS sm2,
         CAST(SUM(CAST(ROUND(s_i, 2) AS DECIMAL(38,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(ROUND(ss_i, 2) AS DECIMAL(38,2))) AS DOUBLE) AS ss,
         CAST(SUM(CAST(ROUND(s_i * s_i / m_i, 6) AS DECIMAL(38,6))) AS DOUBLE)
             AS sbg
  FROM per)
SELECT k AS n_clusters, n AS n_units,
       ROUND(((sbg - s * s / n) / (CAST(k AS DOUBLE) - 1.0)
              - ((ss - s * s / n) - (sbg - s * s / n))
                / (CAST(n AS DOUBLE) - k))
             / ((sbg - s * s / n) / (CAST(k AS DOUBLE) - 1.0)
                + (((CAST(n AS DOUBLE) - CAST(sm2 AS DOUBLE) / n)
                    / (CAST(k AS DOUBLE) - 1.0)) - 1.0)
                  * (((ss - s * s / n) - (sbg - s * s / n))
                     / (CAST(n AS DOUBLE) - k))), 6) AS icc,
       ROUND(1.0 + (CAST(n AS DOUBLE) / k - 1.0)
             * (((sbg - s * s / n) / (CAST(k AS DOUBLE) - 1.0)
                 - ((ss - s * s / n) - (sbg - s * s / n))
                   / (CAST(n AS DOUBLE) - k))
                / ((sbg - s * s / n) / (CAST(k AS DOUBLE) - 1.0)
                   + (((CAST(n AS DOUBLE) - CAST(sm2 AS DOUBLE) / n)
                       / (CAST(k AS DOUBLE) - 1.0)) - 1.0)
                     * (((ss - s * s / n) - (sbg - s * s / n))
                        / (CAST(n AS DOUBLE) - k)))), 6) AS deff,
       ROUND(CAST(n AS DOUBLE)
             / (1.0 + (CAST(n AS DOUBLE) / k - 1.0)
                * (((sbg - s * s / n) / (CAST(k AS DOUBLE) - 1.0)
                    - ((ss - s * s / n) - (sbg - s * s / n))
                      / (CAST(n AS DOUBLE) - k))
                   / ((sbg - s * s / n) / (CAST(k AS DOUBLE) - 1.0)
                      + (((CAST(n AS DOUBLE) - CAST(sm2 AS DOUBLE) / n)
                          / (CAST(k AS DOUBLE) - 1.0)) - 1.0)
                        * (((ss - s * s / n) - (sbg - s * s / n))
                           / (CAST(n AS DOUBLE) - k))))), 2) AS n_effective
FROM agg
"""

QUERIES["q_icc_design_effect"] = QuerySpec(
    q_icc_design_effect,
    Q_ICC_SQL,
    "ICC(1) + design effect + effective n for nation-clustered spend — "
    "one-way ANOVA moments with the unequal-size a0 correction",
)


# ------------------------------------------------------------ Kish n_eff
# Weights = customer spend; n_eff = (sum w)^2 / sum w^2.


def q_kish_neff(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("w")
        )
    )
    agg = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").cast("double").alias("sw"),
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sww"),
    )
    neff = F.col("sw") * F.col("sw") / F.col("sww")
    return agg.select(
        "n",
        F.round(neff, 2).alias("kish_neff"),
        F.round(neff / F.col("n").cast("double"), 6).alias("efficiency"),
        F.round(F.col("n").cast("double") / neff, 6).alias("deff_weights"),
    )


Q_KISH_SQL = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS w
  FROM orders GROUP BY o_custkey),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(w) AS DOUBLE) AS sw,
         CAST(SUM(CAST(w * w AS DECIMAL(38,0))) AS DOUBLE) AS sww
  FROM spend)
SELECT n,
       ROUND(sw * sw / sww, 2) AS kish_neff,
       ROUND(sw * sw / sww / n, 6) AS efficiency,
       ROUND(n / (sw * sw / sww), 6) AS deff_weights
FROM agg
"""

QUERIES["q_kish_neff"] = QuerySpec(
    q_kish_neff,
    Q_KISH_SQL,
    "Kish effective sample size under spend weights — one scan, "
    "decimal weight moments",
)


# ------------------------------------------------------ weight trimming
# Cap weights at 3x mean; report the weighted-mean shift (of account
# balance) and the Kish-efficiency gain.


def q_weight_trimming(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .cast("double")
            .alias("w")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("y")
    )
    j = spend.join(cust, spend.o_custkey == cust.c_custkey).select("w", "y")
    mw = j.agg((F.sum(F.round("w", 0).cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))).alias("w_mean"))
    t = j.crossJoin(F.broadcast(mw)).select(
        "w",
        "y",
        F.least(F.col("w"), F.lit(_TRIM_MULT) * F.col("w_mean")).alias("wt"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("w", 0).cast("decimal(38,0)")).cast("double").alias("sw"),
        F.sum(F.round(F.col("w") * F.col("w"), 0).cast("decimal(38,0)"))
        .cast("double")
        .alias("sww"),
        F.sum(F.round(F.col("w") * F.col("y"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("swy"),
        F.sum(F.round("wt", 4).cast("decimal(38,4)")).cast("double").alias("st"),
        F.sum(F.round(F.col("wt") * F.col("wt"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("stt"),
        F.sum(F.round(F.col("wt") * F.col("y"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("sty"),
        F.sum((F.col("wt") < F.col("w")).cast("long")).alias("n_trimmed"),
    )
    return agg.select(
        "n",
        "n_trimmed",
        F.round(F.col("swy") / F.col("sw"), 6).alias("wmean_raw"),
        F.round(F.col("sty") / F.col("st"), 6).alias("wmean_trimmed"),
        F.round(
            F.col("sw") * F.col("sw") / F.col("sww") / F.col("n").cast("double"),
            6,
        ).alias("efficiency_raw"),
        F.round(
            F.col("st") * F.col("st") / F.col("stt") / F.col("n").cast("double"),
            6,
        ).alias("efficiency_trimmed"),
    )


Q_TRIM_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0)))
              AS DOUBLE) AS w
  FROM orders GROUP BY o_custkey),
j AS (
  SELECT w, c_acctbal AS y
  FROM spend JOIN customer ON o_custkey = c_custkey),
mw AS (
  SELECT CAST(SUM(CAST(ROUND(w, 0) AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)
             AS w_mean
  FROM j),
t AS (
  SELECT w, y, LEAST(w, {_TRIM_MULT} * w_mean) AS wt
  FROM j CROSS JOIN mw),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(w, 0) AS DECIMAL(38,0))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(ROUND(w * w, 0) AS DECIMAL(38,0))) AS DOUBLE) AS sww,
         CAST(SUM(CAST(ROUND(w * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS swy,
         CAST(SUM(CAST(ROUND(wt, 4) AS DECIMAL(38,4))) AS DOUBLE) AS st,
         CAST(SUM(CAST(ROUND(wt * wt, 4) AS DECIMAL(38,4))) AS DOUBLE) AS stt,
         CAST(SUM(CAST(ROUND(wt * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sty,
         CAST(SUM(CASE WHEN wt < w THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed
  FROM t)
SELECT n, n_trimmed,
       ROUND(swy / sw, 6) AS wmean_raw,
       ROUND(sty / st, 6) AS wmean_trimmed,
       ROUND(sw * sw / sww / n, 6) AS efficiency_raw,
       ROUND(st * st / stt / n, 6) AS efficiency_trimmed
FROM agg
"""

QUERIES["q_weight_trimming"] = QuerySpec(
    q_weight_trimming,
    Q_TRIM_SQL,
    "weight trimming at 3x mean: weighted-mean shift vs Kish-efficiency "
    "gain — one scan + 1-row mean broadcast",
)

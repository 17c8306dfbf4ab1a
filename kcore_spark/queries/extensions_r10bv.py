"""Round-10 surface extensions, batch BV (SURVEY §2.3 N r10): the
inequality/segregation-index block — Atkinson's welfare-based
inequality index at two pinned aversion levels over per-customer
spend, the Duncan dissimilarity + isolation indices of market-segment
segregation across nations, and the Hoover (Robin Hood) index — the
share of total spend that would have to move to equalize everyone.
Completes the distribution-shape family next to q_theil_index /
q_lorenz_curve / q_pareto_share.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: spend totals are cents-decimal sums; fractional per-row
terms (sqrt/abs shares) are rounded to fixed scale and decimal-summed.
Scale: each index is one scan folding to per-key totals then a scalar;
the only crosses are 1-row mean/total broadcasts (adjudicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("cents")
        )
    )


_SPEND_SQL = """
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY o_custkey
"""


# ------------------------------------------------------- Atkinson index
# A_0.5 = 1 - ((1/n) sum sqrt(x/mu))^2 ; A_2 = 1 - 1 / ((1/n) sum (mu/x))
# over per-customer spend x (strictly positive by construction).


def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = _spend(spark, sf_dir).select(
        (F.col("cents").cast("double") / 100.0).alias("x")
    )
    agg = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("x"), 2).cast("decimal(38,2)")).alias("s_x"),
        F.sum(F.round(F.sqrt("x"), 10).cast("decimal(38,10)")).alias("s_sqrt"),
        F.sum(F.round(1.0 / F.col("x"), 14).cast("decimal(38,14)")).alias("s_inv"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s_x").cast("double") / nd
    e_sqrt = F.col("s_sqrt").cast("double") / nd / F.sqrt(mu)
    e_inv = mu * F.col("s_inv").cast("double") / nd
    return agg.select(
        "n",
        F.round(mu, 2).alias("mean_spend"),
        F.round(1.0 - e_sqrt * e_sqrt, 6).alias("atkinson_05"),
        F.round(1.0 - 1.0 / e_inv, 6).alias("atkinson_2"),
    )


Q_ATK_SQL = f"""
WITH spend AS (
  SELECT CAST(cents AS DOUBLE) / 100.0 AS x FROM ({_SPEND_SQL})),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2))) AS s_x,
         SUM(CAST(ROUND(SQRT(x), 10) AS DECIMAL(38,10))) AS s_sqrt,
         SUM(CAST(ROUND(1.0 / x, 14) AS DECIMAL(38,14))) AS s_inv
  FROM spend)
SELECT n,
       ROUND(CAST(s_x AS DOUBLE) / n, 2) AS mean_spend,
       ROUND(1.0 - (CAST(s_sqrt AS DOUBLE) / n / SQRT(CAST(s_x AS DOUBLE) / n))
                 * (CAST(s_sqrt AS DOUBLE) / n / SQRT(CAST(s_x AS DOUBLE) / n)),
             6) AS atkinson_05,
       ROUND(1.0 - 1.0 / ((CAST(s_x AS DOUBLE) / n)
                          * CAST(s_inv AS DOUBLE) / n), 6) AS atkinson_2
FROM agg
"""

QUERIES["q_atkinson_index"] = QuerySpec(
    q_atkinson_index,
    Q_ATK_SQL,
    "Atkinson inequality at aversion 0.5 and 2 over per-customer spend — "
    "decimal-summed sqrt/inverse moments, one scan",
)


# ------------------------------------------- dissimilarity + isolation
# Areal units = nations; group a = BUILDING customers, b = the rest.
# D = 0.5 sum_i |a_i/A - b_i/B|; isolation of a: P*_aa =
# sum_i (a_i/A) * (a_i / t_i).


def q_dissimilarity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", (F.col("c_mktsegment") == "BUILDING").alias("in_a")
    )
    units = cust.groupBy("c_nationkey").agg(
        F.sum(F.col("in_a").cast("long")).alias("a_i"),
        F.sum((~F.col("in_a")).cast("long")).alias("b_i"),
    )
    tot = units.agg(
        F.sum("a_i").cast("long").alias("a"), F.sum("b_i").cast("long").alias("b")
    )
    terms = units.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.abs(
                F.col("a_i") / F.col("a").cast("double")
                - F.col("b_i") / F.col("b").cast("double")
            ),
            12,
        )
        .cast("decimal(38,12)")
        .alias("d_t"),
        F.round(
            (F.col("a_i") / F.col("a").cast("double"))
            * (F.col("a_i") / (F.col("a_i") + F.col("b_i")).cast("double")),
            12,
        )
        .cast("decimal(38,12)")
        .alias("iso_t"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("d_t").cast("double").alias("s_d"),
        F.sum("iso_t").cast("double").alias("s_iso"),
    )
    return agg.select(
        "n_units",
        F.round(0.5 * F.col("s_d"), 6).alias("dissimilarity"),
        F.round("s_iso", 6).alias("isolation_a"),
    )


Q_DISS_SQL = """
WITH units AS (
  SELECT c_nationkey,
         SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS a_i,
         SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END) AS b_i
  FROM customer GROUP BY 1),
tot AS (SELECT CAST(SUM(a_i) AS BIGINT) AS a, CAST(SUM(b_i) AS BIGINT) AS b
        FROM units),
terms AS (
  SELECT CAST(ROUND(ABS(a_i / CAST(a AS DOUBLE) - b_i / CAST(b AS DOUBLE)), 12)
              AS DECIMAL(38,12)) AS d_t,
         CAST(ROUND((a_i / CAST(a AS DOUBLE))
                    * (a_i / CAST(a_i + b_i AS DOUBLE)), 12)
              AS DECIMAL(38,12)) AS iso_t
  FROM units CROSS JOIN tot),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(d_t) AS DOUBLE) AS s_d,
         CAST(SUM(iso_t) AS DOUBLE) AS s_iso
  FROM terms)
SELECT n_units,
       ROUND(0.5 * s_d, 6) AS dissimilarity,
       ROUND(s_iso, 6) AS isolation_a
FROM agg
"""

QUERIES["q_dissimilarity_index"] = QuerySpec(
    q_dissimilarity_index,
    Q_DISS_SQL,
    "Duncan dissimilarity + isolation of the BUILDING segment across "
    "nations — integer cell folds, 25-row term table",
)


# ----------------------------------------------------------- Hoover index
# H = sum |x_i - mu| / (2 * sum x) — the Robin Hood share.


def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = _spend(spark, sf_dir)
    tot = spend.agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    terms = spend.crossJoin(F.broadcast(tot)).select(
        "n",
        "s",
        F.round(
            F.abs(
                F.col("cents").cast("double")
                - F.col("s").cast("double") / F.col("n")
            ),
            6,
        )
        .cast("decimal(38,6)")
        .alias("dev"),
    )
    agg = terms.groupBy("n", "s").agg(F.sum("dev").cast("double").alias("s_dev"))
    return agg.select(
        "n",
        F.round(F.col("s").cast("double") / 100.0, 2).alias("total_spend"),
        F.round(F.col("s_dev") / (2.0 * F.col("s").cast("double")), 6).alias(
            "hoover"
        ),
    )


Q_HOOVER_SQL = f"""
WITH spend AS ({_SPEND_SQL}),
tot AS (SELECT SUM(cents) AS s, CAST(COUNT(*) AS BIGINT) AS n FROM spend),
terms AS (
  SELECT n, s,
         CAST(ROUND(ABS(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n), 6)
              AS DECIMAL(38,6)) AS dev
  FROM spend CROSS JOIN tot),
agg AS (SELECT n, s, CAST(SUM(dev) AS DOUBLE) AS s_dev FROM terms GROUP BY 1, 2)
SELECT n,
       ROUND(CAST(s AS DOUBLE) / 100.0, 2) AS total_spend,
       ROUND(s_dev / (2.0 * CAST(s AS DOUBLE)), 6) AS hoover
FROM agg
"""

QUERIES["q_hoover_index"] = QuerySpec(
    q_hoover_index,
    Q_HOOVER_SQL,
    "Hoover/Robin-Hood index over per-customer spend — decimal absolute "
    "deviations around the broadcast mean, one scan",
)

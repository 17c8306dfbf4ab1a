"""Round-10 surface extensions, batch AS (SURVEY §2.3 N r10): the
robust-statistics block — the Huber M-estimator of location (three
unrolled IRLS rounds at c = 1.345, the standard outlier-resistant
mean), biweight midvariance (the robust scale companion), and a
distribution-free median confidence interval from order statistics
(binomial ranks through the pinned normal approximation, values
fetched by distributed exact rank). Completes the robust family next
to q_mad_outliers, q_winsorized_mean and q_theil_sen.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: median/MAD are exact interpolated percentiles (the
F.percentile <-> quantile_cont pairing); every IRLS iterate is
ROUND(·,9)-pinned before the next weight pass; weighted sums are
pinned-decimal (order-free).
Scale: each IRLS round is one scan + a 1-row broadcast (3 rounds,
fixed); the CI picks two rows by the repo's _dist_rank pattern — no
single-task sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_rank

QUERIES: dict[str, QuerySpec] = {}

_HUBER_C = 1.345


def _src(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("x")
    )


_SRC_SQL = "SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS x FROM customer"


# ------------------------------------------------ Huber M-estimator
# scale s = 1.4826·MAD (fixed); start at the median; three IRLS
# rounds mu <- Σ w·x / Σ w with w = min(1, c·s/|x−mu|), each iterate
# ROUND(·,9)-pinned.


def q_huber_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _src(spark, sf_dir)
    med = src.agg(F.percentile("x", 0.5).alias("med"))
    mad = (
        src.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("x") - F.col("med")).alias("ad"), "med")
        .agg(
            F.first("med").alias("med"),
            (F.percentile("ad", 0.5) * 1.4826).alias("s"),
        )
    )
    state = mad.select(F.round("med", 9).alias("mu"), F.round("s", 9).alias("s"))
    for _ in range(3):
        j = src.crossJoin(F.broadcast(state))
        w = F.least(
            F.lit(1.0), _HUBER_C * F.col("s") / F.abs(F.col("x") - F.col("mu"))
        )
        w = F.when(F.col("x") == F.col("mu"), F.lit(1.0)).otherwise(w)
        upd = j.agg(
            F.first("s").alias("s_raw"),
            F.sum(F.round(w * F.col("x"), 6).cast("decimal(28,6)")).alias("swx"),
            F.sum(F.round(w, 9).cast("decimal(28,9)")).alias("sw"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        state = upd.select(
            F.round(
                F.col("swx").cast("double") / F.col("sw").cast("double"), 9
            ).alias("mu"),
            F.round("s_raw", 9).alias("s"),
            F.col("n"),
        )
    return state.select(
        "n",
        F.round("mu", 6).alias("huber_location"),
        F.round("s", 6).alias("scale_mad"),
    )


def _huber_round_sql(prev: str) -> str:
    """One IRLS round as a CTE body reading state CTE ``prev``."""
    w = (
        f"CASE WHEN x = {prev}.mu THEN 1.0 "
        f"ELSE LEAST(1.0, {_HUBER_C} * {prev}.s / ABS(x - {prev}.mu)) END"
    )
    return f"""
  SELECT ROUND(CAST(SUM(CAST(ROUND(({w}) * x, 6) AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(SUM(CAST(ROUND({w}, 9) AS DECIMAL(28,9))) AS DOUBLE), 9) AS mu,
         ROUND(ANY_VALUE({prev}.s), 9) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM src CROSS JOIN {prev}
"""


Q_HUBER_SQL = f"""
WITH src AS ({_SRC_SQL}),
med AS (SELECT quantile_cont(x, 0.5) AS med FROM src),
st0 AS (
  SELECT ROUND(ANY_VALUE(med), 9) AS mu,
         ROUND(quantile_cont(ABS(x - med), 0.5) * 1.4826, 9) AS s
  FROM src CROSS JOIN med),
st1 AS ({_huber_round_sql("st0")}),
st2 AS ({_huber_round_sql("st1")}),
st3 AS ({_huber_round_sql("st2")})
SELECT n, ROUND(mu, 6) AS huber_location, ROUND(s, 6) AS scale_mad
FROM st3
"""

QUERIES["q_huber_m"] = QuerySpec(
    q_huber_m,
    Q_HUBER_SQL,
    "Huber M-estimator of location (3 unrolled IRLS rounds, c=1.345) "
    "— pinned iterates, decimal weighted sums",
)


# -------------------------------------------- biweight midvariance
# u = (x − med)/(9·MAD); for |u| < 1:
#   bwmv = n · Σ (x−med)²(1−u²)⁴ / (Σ (1−u²)(1−5u²))²


def q_biweight_midvariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _src(spark, sf_dir)
    med = src.agg(F.percentile("x", 0.5).alias("med"))
    mad = (
        src.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("x") - F.col("med")).alias("ad"), "med")
        .agg(F.first("med").alias("med"), F.percentile("ad", 0.5).alias("mad"))
    )
    j = src.crossJoin(F.broadcast(mad))
    u = (F.col("x") - F.col("med")) / (9.0 * F.col("mad"))
    inside = F.abs(u) < 1.0
    d2 = (F.col("x") - F.col("med")) ** 2
    num_t = F.when(inside, d2 * F.pow(1.0 - u * u, F.lit(4.0))).otherwise(F.lit(0.0))
    den_t = F.when(inside, (1.0 - u * u) * (1.0 - 5.0 * u * u)).otherwise(F.lit(0.0))
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(num_t, 4).cast("decimal(38,4)")).alias("num"),
        F.sum(F.round(den_t, 9).cast("decimal(28,9)")).alias("den"),
    )
    bwmv = (
        F.col("n").cast("double")
        * F.col("num").cast("double")
        / (F.col("den").cast("double") ** 2)
    )
    return agg.select(
        "n",
        F.round(bwmv, 6).alias("biweight_midvariance"),
        F.round(F.sqrt(bwmv), 6).alias("biweight_midsd"),
    )


Q_BWMV_SQL = f"""
WITH src AS ({_SRC_SQL}),
med AS (SELECT quantile_cont(x, 0.5) AS med FROM src),
mad AS (
  SELECT ANY_VALUE(med) AS med, quantile_cont(ABS(x - med), 0.5) AS mad
  FROM src CROSS JOIN med),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(CASE WHEN ABS((x - med) / (9.0 * mad)) < 1.0
                             THEN (x - med) * (x - med)
                                  * POWER(1.0 - ((x - med) / (9.0 * mad))
                                                * ((x - med) / (9.0 * mad)), 4.0)
                             ELSE 0.0 END, 4) AS DECIMAL(38,4))) AS num,
         SUM(CAST(ROUND(CASE WHEN ABS((x - med) / (9.0 * mad)) < 1.0
                             THEN (1.0 - ((x - med) / (9.0 * mad))
                                         * ((x - med) / (9.0 * mad)))
                                  * (1.0 - 5.0 * ((x - med) / (9.0 * mad))
                                               * ((x - med) / (9.0 * mad)))
                             ELSE 0.0 END, 9) AS DECIMAL(28,9))) AS den
  FROM src CROSS JOIN mad)
SELECT n,
       ROUND(CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
             / (CAST(den AS DOUBLE) * CAST(den AS DOUBLE)), 6)
           AS biweight_midvariance,
       ROUND(SQRT(CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
                  / (CAST(den AS DOUBLE) * CAST(den AS DOUBLE))), 6)
           AS biweight_midsd
FROM agg
"""

QUERIES["q_biweight_midvariance"] = QuerySpec(
    q_biweight_midvariance,
    Q_BWMV_SQL,
    "biweight midvariance / midsd — robust scale from one pass over "
    "median/MAD-standardized residuals",
)


# ---------------------------------------------- median CI (order stats)
# 95% distribution-free CI: ranks n/2 ± z·√n/2 (normal approximation
# to Binomial(n, 1/2), z = 1.959964); the two order statistics are
# fetched by the repo's distributed exact rank.


def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _src(spark, sf_dir)
    bounds = src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile("x", 0.5).alias("median"),
    ).select(
        "n",
        "median",
        F.greatest(
            F.lit(1),
            F.floor(
                F.col("n") / 2.0 - 1.959964 * F.sqrt(F.col("n").cast("double")) / 2.0
            ).cast("long"),
        ).alias("lo_rank"),
        F.least(
            F.col("n"),
            (
                F.ceil(
                    F.col("n") / 2.0
                    + 1.959964 * F.sqrt(F.col("n").cast("double")) / 2.0
                )
                + 1
            ).cast("long"),
        ).alias("hi_rank"),
    )
    ranked = _dist_rank(src, [F.col("x"), F.col("c_custkey")])
    picked = ranked.crossJoin(F.broadcast(bounds)).where(
        (F.col("rk") == F.col("lo_rank")) | (F.col("rk") == F.col("hi_rank"))
    )
    return picked.groupBy("n", "median", "lo_rank", "hi_rank").agg(
        F.min("x").alias("ci_lo"), F.max("x").alias("ci_hi")
    ).select(
        "n",
        F.round("median", 6).alias("median"),
        "lo_rank",
        "hi_rank",
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
    )


Q_MEDIAN_CI_SQL = f"""
WITH src AS ({_SRC_SQL}),
bounds AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, quantile_cont(x, 0.5) AS median,
         GREATEST(1, CAST(FLOOR(COUNT(*) / 2.0
                                - 1.959964 * SQRT(COUNT(*)) / 2.0) AS BIGINT))
             AS lo_rank,
         LEAST(CAST(COUNT(*) AS BIGINT),
               CAST(CEIL(COUNT(*) / 2.0
                         + 1.959964 * SQRT(COUNT(*)) / 2.0) + 1 AS BIGINT))
             AS hi_rank
  FROM src),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, c_custkey) AS rk FROM src),
picked AS (
  SELECT n, median, lo_rank, hi_rank, x
  FROM ranked CROSS JOIN bounds
  WHERE rk = lo_rank OR rk = hi_rank)
SELECT n, ROUND(median, 6) AS median, lo_rank, hi_rank,
       ROUND(MIN(x), 6) AS ci_lo, ROUND(MAX(x), 6) AS ci_hi
FROM picked
GROUP BY n, median, lo_rank, hi_rank
"""

QUERIES["q_median_ci"] = QuerySpec(
    q_median_ci,
    Q_MEDIAN_CI_SQL,
    "distribution-free 95% median CI from order statistics — "
    "binomial ranks, values fetched via _dist_rank",
)

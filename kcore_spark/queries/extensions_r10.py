"""Round-10 surface extensions (SURVEY §2.3 N r10): the robust-
statistics / extreme-value block — Grubbs' max-deviation test,
Tukey-fence boxplot statistics, and a moments-fit Gumbel extreme-value
model of daily maxima (MAD robust z and winsorized means already live
in quality_q.py). These are the outlier-audit pass a curation pipeline
runs before trusting any mean-based quality score.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: cross-row sums stay integer/decimal
(Grubbs moments are integer sums of integer daily counts; Gumbel
moments are decimal sums of 6-dp-rounded daily maxima); doubles appear
per-row or in one final division. Exact percentiles pair Spark's
F.percentile with DuckDB's quantile_cont — the established
q_percentiles / q_grouped_quantile_bands convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------ Grubbs' max-deviation test
# G = max|x - mean| / s over the daily event-count series (a bounded
# curve). The moments are INTEGER sums of integer daily counts (exact
# cross-engine); the argmax day is tie-broken by day. Critical-value
# comparison is left to the reader of the statistic (the t-quantile
# needs an inverse-CDF both engines lack); G itself plus n is the
# portable output.


def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    j = daily.crossJoin(F.broadcast(m)).withColumn(
        "mean", F.col("s1").cast("double") / F.col("n")
    )
    # sample variance from integer moments: (n*s2 - s1^2) / (n*(n-1))
    j = j.withColumn(
        "sd",
        F.sqrt(
            (
                F.col("n").cast("double") * F.col("s2") - F.col("s1") * F.col("s1")
            )
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ),
    ).withColumn("absdev", F.abs(F.col("c") - F.col("mean")))
    return (
        j.orderBy(F.col("absdev").desc(), F.col("day"))
        .limit(1)
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("day").cast("string").alias("peak_day"),
            F.col("c").cast("long").alias("peak_count"),
            F.round(F.col("mean"), 6).alias("mean_count"),
            F.round(F.col("absdev") / F.col("sd"), 6).alias("grubbs_g"),
        )
    )


Q_GRUBBS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
m AS (
  SELECT COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2 FROM daily),
j AS (
  SELECT d.day, d.c, m.n,
         CAST(m.s1 AS DOUBLE) / m.n AS mean,
         SQRT((CAST(m.n AS DOUBLE) * m.s2 - CAST(m.s1 AS DOUBLE) * m.s1)
              / (CAST(m.n AS DOUBLE) * (m.n - 1))) AS sd,
         ABS(d.c - CAST(m.s1 AS DOUBLE) / m.n) AS absdev
  FROM daily d, m)
SELECT CAST(n AS BIGINT) AS n,
       CAST(day AS VARCHAR) AS peak_day,
       CAST(c AS BIGINT) AS peak_count,
       ROUND(mean, 6) AS mean_count,
       ROUND(absdev / sd, 6) AS grubbs_g
FROM j
ORDER BY absdev DESC, day
LIMIT 1
"""

QUERIES["q_grubbs_outlier"] = QuerySpec(
    q_grubbs_outlier,
    Q_GRUBBS_SQL,
    "Grubbs' max-deviation statistic over the daily event-count "
    "series (integer-exact moments) — single-outlier test",
)


# -------------------------------- Tukey-fence boxplot statistics
# Per event type on `value`: quartiles, IQR, 1.5-IQR fences, outlier
# counts per side, and the whisker ends (extreme non-outliers) — the
# full boxplot tuple. One keyed exact-percentile pass + one
# conditional-aggregate scan; k-row output.


def q_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    qs = ev.groupBy("event_type").agg(
        F.percentile("v", 0.25).alias("q1"),
        F.percentile("v", 0.75).alias("q3"),
    )
    j = ev.join(F.broadcast(qs), "event_type").withColumn(
        "lo", F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    ).withColumn("hi", F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("q1"), 6).alias("q1"),
            F.round(F.first("q3"), 6).alias("q3"),
            F.sum((F.col("v") < F.col("lo")).cast("int"))
            .cast("long")
            .alias("n_low_outliers"),
            F.sum((F.col("v") > F.col("hi")).cast("int"))
            .cast("long")
            .alias("n_high_outliers"),
            F.round(
                F.min(F.when(F.col("v") >= F.col("lo"), F.col("v"))), 6
            ).alias("whisker_lo"),
            F.round(
                F.max(F.when(F.col("v") <= F.col("hi"), F.col("v"))), 6
            ).alias("whisker_hi"),
        )
        .orderBy("event_type")
    )


Q_TUKEY_SQL = """
WITH src AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
qs AS (
  SELECT event_type, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM src GROUP BY event_type),
j AS (
  SELECT s.event_type, s.v, q.q1, q.q3,
         q.q1 - 1.5 * (q.q3 - q.q1) AS lo,
         q.q3 + 1.5 * (q.q3 - q.q1) AS hi
  FROM src s JOIN qs q USING (event_type))
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ANY_VALUE(q1), 6) AS q1, ROUND(ANY_VALUE(q3), 6) AS q3,
       CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_outliers,
       CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_outliers,
       ROUND(MIN(CASE WHEN v >= lo THEN v END), 6) AS whisker_lo,
       ROUND(MAX(CASE WHEN v <= hi THEN v END), 6) AS whisker_hi
FROM j
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["q_tukey_fences"] = QuerySpec(
    q_tukey_fences,
    Q_TUKEY_SQL,
    "Tukey 1.5-IQR boxplot statistics per event type (fences, "
    "outlier counts, whisker ends) — the distribution audit tuple",
)


# ----------------------- Gumbel extreme-value fit of daily maxima
# Block-maxima EVT: the daily max of `value` is Gumbel-distributed in
# the limit; fit (mu, beta) by moments (beta = s*sqrt(6)/pi,
# mu = mean - gamma*beta), report the 30-day return level and the
# fitted CDF at the observed all-time max. Scale shape: one keyed
# max-aggregation rides the scan (map-side combine), the fit runs on
# the calendar-bounded daily-max curve; moments are DECIMAL sums of
# 6-dp-rounded maxima so the cross-row sums are order-independent.

_EULER_GAMMA = 0.57721566490153286
_SQRT6_PI = 0.7796968012336761  # sqrt(6)/pi


def q_gumbel_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.max("value"), 6).cast("decimal(18,6)").alias("mx")
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").cast("decimal(38,6)").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("decimal(38,12)").alias("s2"),
        F.max("mx").alias("gmax"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n").cast("double") * F.col("s2").cast("double")
         - F.col("s1").cast("double") * F.col("s1").cast("double"))
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    beta = sd * F.lit(_SQRT6_PI)
    mu = mean - F.lit(_EULER_GAMMA) * beta
    # 30-day return level: mu - beta * ln(-ln(1 - 1/30))
    rl30 = mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / 30.0)))
    cdf_at_max = F.exp(-F.exp(-(F.col("gmax").cast("double") - mu) / beta))
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(rl30, 6).alias("return_level_30d"),
        F.round(cdf_at_max, 6).alias("cdf_at_observed_max"),
    )


Q_GUMBEL_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(MAX(value), 6) AS DECIMAL(18,6)) AS mx
  FROM events GROUP BY 1),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(mx) AS DECIMAL(38,6)) AS s1,
         CAST(SUM(mx * mx) AS DECIMAL(38,12)) AS s2,
         MAX(mx) AS gmax
  FROM daily),
fit AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS mean,
         SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / (CAST(n AS DOUBLE) * (n - 1))) * {_SQRT6_PI} AS beta,
         CAST(gmax AS DOUBLE) AS gmax
  FROM m)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(mean - {_EULER_GAMMA} * beta, 6) AS gumbel_mu,
       ROUND(beta, 6) AS gumbel_beta,
       ROUND(mean - {_EULER_GAMMA} * beta
             - beta * LN(-LN(1 - 1.0/30.0)), 6) AS return_level_30d,
       ROUND(EXP(-EXP(-(gmax - (mean - {_EULER_GAMMA} * beta)) / beta)), 6)
         AS cdf_at_observed_max
FROM fit
"""

QUERIES["q_gumbel_extremes"] = QuerySpec(
    q_gumbel_extremes,
    Q_GUMBEL_SQL,
    "Gumbel extreme-value fit of daily value maxima (moments, 30-day "
    "return level, CDF at observed max) — block-maxima EVT",
)

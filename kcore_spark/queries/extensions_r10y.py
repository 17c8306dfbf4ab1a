"""Round-10 surface extensions, batch Y (SURVEY §2.3 N r10): the
count-data block — two-sample Poisson rate-ratio with Wald interval
(the incident-rate comparison), negative-binomial overdispersion fits
per event type (is a Poisson model even admissible), and Fisher's
combined-probability statistic over the md5 hypothesis catalog (the
p-value combination completing the BH/Holm multiple-testing family).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: counts/exposures are integers; log terms are rounded
then decimal-summed; the Wald interval is closed-form doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_Z = 1.959963984540054


# --------------------- two-sample Poisson rate ratio (click vs error)
# Events per user-day of exposure for two types; rate ratio with the
# Wald interval on the log scale: exp(log(r) +/- z sqrt(1/c1 + 1/c2)).
# Integer counts and exposures, closed-form doubles.


def q_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    m = ev.agg(
        F.sum((F.col("event_type") == "click").cast("int")).alias("c1"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("c2"),
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1).alias(
            "days"
        ),
    )
    r1 = F.col("c1").cast("double") / F.col("days")
    r2 = F.col("c2").cast("double") / F.col("days")
    lr = F.log(F.col("c1").cast("double") / F.col("c2"))
    se = F.sqrt(1.0 / F.col("c1") + 1.0 / F.col("c2"))
    return m.select(
        F.col("c1").cast("long").alias("n_click"),
        F.col("c2").cast("long").alias("n_error"),
        F.col("days").cast("long").alias("exposure_days"),
        F.round(r1, 6).alias("click_rate_per_day"),
        F.round(r2, 6).alias("error_rate_per_day"),
        F.round(F.exp(lr), 6).alias("rate_ratio"),
        F.round(F.exp(lr - F.lit(_Z) * se), 6).alias("rr_lo95"),
        F.round(F.exp(lr + F.lit(_Z) * se), 6).alias("rr_hi95"),
    )


Q_RATE_SQL = f"""
WITH m AS (
  SELECT SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c2,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1
           AS days
  FROM events)
SELECT CAST(c1 AS BIGINT) AS n_click, CAST(c2 AS BIGINT) AS n_error,
       CAST(days AS BIGINT) AS exposure_days,
       ROUND(CAST(c1 AS DOUBLE) / days, 6) AS click_rate_per_day,
       ROUND(CAST(c2 AS DOUBLE) / days, 6) AS error_rate_per_day,
       ROUND(EXP(LN(CAST(c1 AS DOUBLE) / c2)), 6) AS rate_ratio,
       ROUND(EXP(LN(CAST(c1 AS DOUBLE) / c2)
                 - {_Z} * SQRT(1.0 / c1 + 1.0 / c2)), 6) AS rr_lo95,
       ROUND(EXP(LN(CAST(c1 AS DOUBLE) / c2)
                 + {_Z} * SQRT(1.0 / c1 + 1.0 / c2)), 6) AS rr_hi95
FROM m
"""

QUERIES["q_poisson_rate_ratio"] = QuerySpec(
    q_poisson_rate_ratio,
    Q_RATE_SQL,
    "two-sample Poisson rate ratio (click vs error per exposure day) "
    "with the log-scale Wald 95% interval",
)


# ------------------- negative-binomial overdispersion fit per type
# Daily counts per type: dispersion index var/mean and the
# method-of-moments NB size r = m^2/(v - m) (NULL when v <= m — the
# Poisson-admissible case). Integer daily counts, moment arithmetic.


def q_nb_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    per = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("n").cast("double") * F.col("s2") - F.col("s1") * F.col("s1")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    return per.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var / mean, 6).alias("dispersion_index"),
        F.round(
            F.when(var > mean, mean * mean / (var - mean)), 6
        ).alias("nb_size_r"),
    ).orderBy("event_type")


Q_NB_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
per AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
  FROM daily GROUP BY event_type),
calc AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n AS DOUBLE) * (n - 1)) AS var
  FROM per)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       ROUND(mean, 6) AS mean_daily,
       ROUND(var / mean, 6) AS dispersion_index,
       ROUND(CASE WHEN var > mean THEN mean * mean / (var - mean) END, 6)
         AS nb_size_r
FROM calc
ORDER BY event_type
"""

QUERIES["q_nb_overdispersion"] = QuerySpec(
    q_nb_overdispersion,
    Q_NB_SQL,
    "negative-binomial overdispersion fit per event type (dispersion "
    "index + method-of-moments size) — Poisson admissibility",
)


# ------------------ Fisher's combined probability (the catalog)
# X2 = -2 sum ln p over the 25 md5-uniform catalog p-values (the
# q_bh_fdr construction) ~ chi2 with 2m df under the global null.
# Log terms rounded then decimal-summed.


def q_fisher_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select("n_name")
    h = F.conv(F.substring(F.md5(F.col("n_name")), 1, 8), 16, 10).cast("double")
    u = (h + 1) / F.lit(4294967296.0)
    p = F.round(u * u * u, 12)
    terms = nat.select(
        F.round(-2.0 * F.log(p), 12).cast("decimal(28,12)").alias("t")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("m_hypotheses"),
        (F.count(F.lit(1)) * 2).cast("long").alias("chi2_df"),
        F.round(F.sum("t").cast("double"), 6).alias("fisher_x2"),
    )


Q_FISHER_SQL = """
WITH u AS (
  SELECT n_name,
         (('0x' || substring(md5(n_name), 1, 8))::BIGINT + 1.0) / 4294967296.0 AS uu
  FROM nation),
h AS (SELECT ROUND(uu * uu * uu, 12) AS p FROM u),
terms AS (
  SELECT CAST(ROUND(-2.0 * LN(p), 12) AS DECIMAL(28,12)) AS t FROM h)
SELECT CAST(COUNT(*) AS BIGINT) AS m_hypotheses,
       CAST(COUNT(*) * 2 AS BIGINT) AS chi2_df,
       ROUND(CAST(SUM(t) AS DOUBLE), 6) AS fisher_x2
FROM terms
"""

QUERIES["q_fisher_combined"] = QuerySpec(
    q_fisher_combined,
    Q_FISHER_SQL,
    "Fisher's combined-probability X2 over the 25-hypothesis catalog "
    "(-2 sum ln p, decimal term sums) — p-value combination",
)

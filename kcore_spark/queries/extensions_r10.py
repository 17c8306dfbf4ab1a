"""Round-10 surface extensions (SURVEY §2.3 N r10): the robust-
statistics block — MAD-based robust z outliers (Iglewicz-Hoaglin),
winsorized/trimmed means, Grubbs' max-deviation test, and Tukey-fence
boxplot statistics. These are the outlier-audit pass a curation
pipeline runs before trusting any mean-based quality score.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: cross-row sums stay integer/decimal
(winsorized values are rounded then cast to decimal BEFORE the
cross-row average; Grubbs moments are integer sums of integer daily
counts); doubles appear per-row or in one final division. Exact
percentiles pair Spark's F.percentile with DuckDB's quantile_cont —
the established q_percentiles / q_grouped_quantile_bands convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------ MAD robust z outliers (per group)
# Median absolute deviation is the 50%-breakdown robust scale: robust
# z = 0.6745 (x - med) / MAD survives the very outliers a stddev-based
# z is destroyed by. Per order-priority group: med, MAD, and the count
# of |z| > 3.5 (the Iglewicz-Hoaglin cutoff). Scale shape: two keyed
# exact-percentile aggregations (5 groups) + one hash join back — no
# global ordering anywhere; at 100 TB the percentile can degrade to
# percentile_approx without changing the plan shape.


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("x")
    )
    med = orders.groupBy("o_orderpriority").agg(
        F.percentile("x", 0.5).alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").withColumn(
        "absdev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("med").alias("med0"),
        F.percentile("absdev", 0.5).alias("mad"),
    )
    out = (
        dev.join(F.broadcast(mad.select("o_orderpriority", "mad")), "o_orderpriority")
        .where(F.lit(0.6745) * F.col("absdev") > F.lit(3.5) * F.col("mad"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_outliers"))
    )
    return (
        mad.join(out, "o_orderpriority", "left")
        .na.fill({"n_outliers": 0})
        .select(
            "o_orderpriority",
            "n",
            F.round("med0", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
        .orderBy("o_orderpriority")
    )


Q_MAD_SQL = """
WITH src AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS x FROM orders),
med AS (
  SELECT o_orderpriority, quantile_cont(x, 0.5) AS med
  FROM src GROUP BY o_orderpriority),
dev AS (
  SELECT s.o_orderpriority, ABS(s.x - m.med) AS absdev, m.med
  FROM src s JOIN med m USING (o_orderpriority)),
mad AS (
  SELECT o_orderpriority, COUNT(*) AS n, ANY_VALUE(med) AS med0,
         quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY o_orderpriority),
outl AS (
  SELECT d.o_orderpriority, COUNT(*) AS n_outliers
  FROM dev d JOIN mad m USING (o_orderpriority)
  WHERE 0.6745 * d.absdev > 3.5 * m.mad
  GROUP BY d.o_orderpriority)
SELECT m.o_orderpriority, CAST(m.n AS BIGINT) AS n,
       ROUND(m.med0, 6) AS med, ROUND(m.mad, 6) AS mad,
       CAST(COALESCE(o.n_outliers, 0) AS BIGINT) AS n_outliers
FROM mad m LEFT JOIN outl o USING (o_orderpriority)
ORDER BY m.o_orderpriority
"""

QUERIES["q_mad_outliers"] = QuerySpec(
    q_mad_outliers,
    Q_MAD_SQL,
    "MAD robust z outliers per order priority (Iglewicz-Hoaglin "
    "|z| > 3.5) — the 50%-breakdown outlier audit",
)


# ----------------------------- winsorized and trimmed means (5%)
# The mean-robustification pair: winsorizing clamps to [p05, p95],
# trimming drops outside it. One global percentile pass, then one
# scan computing both: clamped values are rounded to 2 dp and cast to
# DECIMAL before the cross-row average (FIXTURES determinism — a
# double sum over 150k rows is order-dependent), the trim filter is a
# plain range predicate. Output is a 1-row summary.


def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x")
    )
    cuts = orders.agg(
        F.percentile("x", 0.05).alias("p05"),
        F.percentile("x", 0.95).alias("p95"),
    )
    j = orders.crossJoin(F.broadcast(cuts))
    clamped = F.round(
        F.when(F.col("x") < F.col("p05"), F.col("p05"))
        .when(F.col("x") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("x")),
        2,
    ).cast("decimal(18,2)")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.first("p05"), 6).alias("p05"),
        F.round(F.first("p95"), 6).alias("p95"),
        F.sum((F.col("x") < F.col("p05")).cast("int")).cast("long").alias("n_low"),
        F.sum((F.col("x") > F.col("p95")).cast("int")).cast("long").alias("n_high"),
        F.round(F.avg(clamped).cast("double"), 6).alias("winsor_mean"),
        F.round(
            F.avg(
                F.when(
                    (F.col("x") >= F.col("p05")) & (F.col("x") <= F.col("p95")),
                    F.round(F.col("x"), 2).cast("decimal(18,2)"),
                )
            ).cast("double"),
            6,
        ).alias("trimmed_mean"),
    )


Q_WINSOR_SQL = """
WITH src AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders),
cuts AS (
  SELECT quantile_cont(x, 0.05) AS p05, quantile_cont(x, 0.95) AS p95
  FROM src)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ANY_VALUE(p05), 6) AS p05,
       ROUND(ANY_VALUE(p95), 6) AS p95,
       CAST(SUM(CASE WHEN x < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN x > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       ROUND(CAST(AVG(CAST(ROUND(
         CASE WHEN x < p05 THEN p05 WHEN x > p95 THEN p95 ELSE x END, 2)
         AS DECIMAL(18,2))) AS DOUBLE), 6) AS winsor_mean,
       ROUND(CAST(AVG(CASE WHEN x BETWEEN p05 AND p95
         THEN CAST(ROUND(x, 2) AS DECIMAL(18,2)) END) AS DOUBLE), 6)
         AS trimmed_mean
FROM src, cuts
"""

QUERIES["q_winsorized_mean"] = QuerySpec(
    q_winsorized_mean,
    Q_WINSOR_SQL,
    "winsorized + 5% trimmed means of order totals (decimal-exact "
    "averages after clamping) — mean robustification pair",
)


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

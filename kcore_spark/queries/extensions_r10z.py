"""Round-10 surface extensions, batch Z (SURVEY §2.3 N r10): the
lifecycle-signal block — the discrete-time churn hazard curve by
tenure week (the retention readout that cohort tables hide), Storey's
pi0 null-proportion estimate over the hypothesis catalog (the
plug-in that sharpens BH), and local-peak detection on the daily
event series (lag/lead extrema above a significance band).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer user/week counts; peak thresholds from integer
moments; pi0 is one closed-form ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------- discrete-time churn hazard by tenure week
# Tenure week w = weeks since the user's first event; a user is "at
# risk" at week w if they were EVER active at w or later; hazard(w) =
# P(last active week = w | at risk at w). The last observed week is
# excluded (censoring: no chance to churn yet). Keyed min/max per
# user, then a week-indexed rollup with a suffix-sum at-risk walk
# over the bounded week curve.


def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", F.to_date("ts").alias("day")
    )
    span = ev.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    per_user = span.select(
        (F.floor(F.datediff(F.col("last_day"), F.col("first_day")) / 7))
        .cast("int")
        .alias("last_week")
    )
    max_week = per_user.agg(F.max("last_week").alias("mw"))
    ends = per_user.groupBy("last_week").agg(
        F.count(F.lit(1)).alias("n_ending")
    )
    # at_risk(w) = users with last_week >= w  (suffix sum over the
    # bounded week curve)
    w_suffix = Window.orderBy(F.col("last_week").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    walked = ends.withColumn("at_risk", F.sum("n_ending").over(w_suffix))
    out = (
        walked.crossJoin(F.broadcast(max_week))
        .where(F.col("last_week") < F.col("mw"))  # censor the last week
        .select(
            F.col("last_week").cast("int").alias("tenure_week"),
            F.col("at_risk").cast("long").alias("n_at_risk"),
            F.col("n_ending").cast("long").alias("n_churned"),
            F.round(
                F.col("n_ending") / F.col("at_risk").cast("double"), 6
            ).alias("hazard"),
        )
    )
    return out.orderBy("tenure_week")


Q_HAZARD_SQL = """
WITH span AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY user_id),
per_user AS (
  SELECT CAST(FLOOR(date_diff('day', first_day, last_day) / 7) AS INTEGER)
           AS last_week
  FROM span),
mw AS (SELECT MAX(last_week) AS mw FROM per_user),
ends AS (
  SELECT last_week, COUNT(*) AS n_ending FROM per_user GROUP BY last_week),
walked AS (
  SELECT last_week, n_ending,
         SUM(n_ending) OVER (ORDER BY last_week DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS at_risk
  FROM ends)
SELECT CAST(last_week AS INTEGER) AS tenure_week,
       CAST(at_risk AS BIGINT) AS n_at_risk,
       CAST(n_ending AS BIGINT) AS n_churned,
       ROUND(n_ending / CAST(at_risk AS DOUBLE), 6) AS hazard
FROM walked, mw
WHERE last_week < mw
ORDER BY tenure_week
"""

QUERIES["q_churn_hazard"] = QuerySpec(
    q_churn_hazard,
    Q_HAZARD_SQL,
    "discrete-time churn hazard by tenure week (at-risk suffix walk "
    "over the bounded week curve, last week censored)",
)


# --------------------------- Storey's pi0 (null proportion plug-in)
# pi0_hat = #{p > lambda} / ((1 - lambda) m) at lambda = 0.5 over the
# md5-uniform catalog — the estimate that converts BH into the
# adaptive (Storey) FDR procedure. One rollup.

_LAMBDA = 0.5


def q_storey_pi0(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select("n_name")
    h = F.conv(F.substring(F.md5(F.col("n_name")), 1, 8), 16, 10).cast("double")
    u = (h + 1) / F.lit(4294967296.0)
    p = F.round(u * u * u, 12)
    m = nat.select(p.alias("p")).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((F.col("p") > _LAMBDA).cast("int")).alias("n_above"),
    )
    pi0 = F.least(
        F.lit(1.0),
        F.col("n_above").cast("double") / ((1.0 - _LAMBDA) * F.col("m")),
    )
    return m.select(
        F.col("m").cast("long").alias("m_hypotheses"),
        F.col("n_above").cast("long").alias("n_above_lambda"),
        F.round(pi0, 6).alias("pi0_hat"),
    )


Q_PI0_SQL = f"""
WITH u AS (
  SELECT (('0x' || substring(md5(n_name), 1, 8))::BIGINT + 1.0)
           / 4294967296.0 AS uu
  FROM nation),
h AS (SELECT ROUND(uu * uu * uu, 12) AS p FROM u),
m AS (
  SELECT COUNT(*) AS m,
         SUM(CASE WHEN p > {_LAMBDA} THEN 1 ELSE 0 END) AS n_above
  FROM h)
SELECT CAST(m AS BIGINT) AS m_hypotheses,
       CAST(n_above AS BIGINT) AS n_above_lambda,
       ROUND(LEAST(1.0, n_above / ((1 - {_LAMBDA}) * CAST(m AS DOUBLE))), 6)
         AS pi0_hat
FROM m
"""

QUERIES["q_storey_pi0"] = QuerySpec(
    q_storey_pi0,
    Q_PI0_SQL,
    "Storey's pi0 null-proportion estimate at lambda=0.5 over the "
    "hypothesis catalog — the adaptive-FDR plug-in",
)


# ----------------------------- local-peak detection (daily series)
# A day is a peak when its count strictly exceeds both neighbors AND
# clears mean + 1 sd (integer moments). Output: peak count + the
# top-5 peaks. Lag/lead over the calendar-bounded daily curve.


def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    w = Window.orderBy("day")
    d = (
        daily.withColumn("prev", F.lag("c").over(w))
        .withColumn("nxt", F.lead("c").over(w))
        .crossJoin(F.broadcast(m))
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n").cast("double") * F.col("s2") - F.col("s1") * F.col("s1"))
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    peaks = d.where(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("c") > F.col("prev"))
        & (F.col("c") > F.col("nxt"))
        & (F.col("c") > mean + sd)
    )
    return (
        peaks.select(
            F.col("day").cast("string").alias("day"),
            F.col("c").cast("long").alias("n_events"),
            F.round((F.col("c") - mean) / sd, 4).alias("z_score"),
        )
        .orderBy(F.col("n_events").desc(), "day")
        .limit(5)
    )


Q_PEAK_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
m AS (
  SELECT COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2 FROM daily),
d AS (
  SELECT day, c,
         LAG(c) OVER (ORDER BY day) AS prev,
         LEAD(c) OVER (ORDER BY day) AS nxt
  FROM daily),
calc AS (
  SELECT d.*, CAST(m.s1 AS DOUBLE) / m.n AS mean,
         SQRT((CAST(m.n AS DOUBLE) * m.s2 - CAST(m.s1 AS DOUBLE) * m.s1)
              / (CAST(m.n AS DOUBLE) * (m.n - 1))) AS sd
  FROM d, m)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(c AS BIGINT) AS n_events,
       ROUND((c - mean) / sd, 4) AS z_score
FROM calc
WHERE prev IS NOT NULL AND nxt IS NOT NULL
  AND c > prev AND c > nxt AND c > mean + sd
ORDER BY n_events DESC, day
LIMIT 5
"""

QUERIES["q_peak_detection"] = QuerySpec(
    q_peak_detection,
    Q_PEAK_SQL,
    "local-peak detection on the daily event series (strict extrema "
    "above mean + 1 sd, integer moments) — the anomaly shortlist",
)

"""Round-10 surface extensions, batch BF (SURVEY §2.3 N r10): the
operability block — Apdex scores per event stream (the satisfied/
tolerating/frustrated SRE summary at T and 4T), snapshot profile
drift (per-metric comparison between pinned halves — the "did the
pipeline change the data?" check next to q_psi_drift's binned view),
and sessionization-timeout sensitivity (session counts under a
timeout grid from ONE gap scan — the parameter-sweep every
session-definition review asks for).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer counts and decimal-exact sums; md5-pinned
halves; the timeout grid is literal.
Scale: Apdex/profile are one grouped scan; the sensitivity sweep
computes all grid cells as parallel aggregate expressions over one
partitioned-lag pass (no re-scan per timeout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------------------------------------- Apdex
# T = 1.0 in value units; satisfied: v <= T, tolerating: v <= 4T.


def q_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("value") <= 1.0).cast("long")).alias("sat"),
        F.sum(
            ((F.col("value") > 1.0) & (F.col("value") <= 4.0)).cast("long")
        ).alias("tol"),
    )
    return agg.select(
        "event_type",
        "n",
        F.col("sat").cast("long").alias("satisfied"),
        F.col("tol").cast("long").alias("tolerating"),
        F.round(
            (F.col("sat").cast("double") + F.col("tol").cast("double") / 2.0)
            / F.col("n").cast("double"),
            6,
        ).alias("apdex"),
    ).orderBy("event_type")


Q_APDEX_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN value <= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS satisfied,
       CAST(SUM(CASE WHEN value > 1.0 AND value <= 4.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS tolerating,
       ROUND((SUM(CASE WHEN value <= 1.0 THEN 1 ELSE 0 END)
              + SUM(CASE WHEN value > 1.0 AND value <= 4.0 THEN 1 ELSE 0 END) / 2.0)
             / COUNT(*), 6) AS apdex
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["q_apdex_score"] = QuerySpec(
    q_apdex_score,
    Q_APDEX_SQL,
    "Apdex per event stream at T=1/4T — one grouped scan",
)


# ---------------------------------------------------- profile drift
# md5 halves of orders; three metrics side by side with relative
# drift — the snapshot-comparison DQ check.


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    half = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    ).alias("h")
    agg = orders.select(
        half,
        F.col("o_totalprice").cast("decimal(15,2)").alias("p"),
        F.col("o_orderpriority").alias("prio"),
    ).groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("mean_price"),
        F.countDistinct("prio").cast("double").alias("n_prios"),
        F.sum((F.col("prio") == "1-URGENT").cast("long")).cast("double").alias("urgent"),
    )
    a = agg.where(F.col("h") == 0)
    b = agg.where(F.col("h") == 1)
    a2 = a.select(
        F.col("n").alias("n0"),
        F.col("mean_price").alias("m0"),
        (F.col("urgent") / F.col("n").cast("double")).alias("u0"),
        F.col("n_prios").alias("k0"),
    )
    b2 = b.select(
        F.col("n").alias("n1"),
        F.col("mean_price").alias("m1"),
        (F.col("urgent") / F.col("n").cast("double")).alias("u1"),
        F.col("n_prios").alias("k1"),
    )
    j = a2.crossJoin(b2)
    rows = j.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mean_price").alias("metric"),
                    F.round(F.col("m0"), 6).alias("half0"),
                    F.round(F.col("m1"), 6).alias("half1"),
                ),
                F.struct(
                    F.lit("urgent_rate").alias("metric"),
                    F.round(F.col("u0"), 6).alias("half0"),
                    F.round(F.col("u1"), 6).alias("half1"),
                ),
                F.struct(
                    F.lit("n_priorities").alias("metric"),
                    F.round(F.col("k0"), 6).alias("half0"),
                    F.round(F.col("k1"), 6).alias("half1"),
                ),
            )
        ).alias("g")
    )
    return rows.select(
        "g.metric",
        "g.half0",
        "g.half1",
        F.round(
            F.abs(F.col("g.half0") - F.col("g.half1"))
            / F.greatest(F.abs(F.col("g.half0")), F.lit(1e-12)),
            6,
        ).alias("rel_drift"),
    ).orderBy("metric")


Q_PROFILE_DRIFT_SQL = """
WITH src AS (
  SELECT ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2 AS h,
         CAST(o_totalprice AS DECIMAL(15,2)) AS p, o_orderpriority AS prio
  FROM orders),
agg AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(p) AS DOUBLE) / COUNT(*) AS mean_price,
         CAST(COUNT(DISTINCT prio) AS DOUBLE) AS n_prios,
         CAST(SUM(CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS urgent_rate
  FROM src GROUP BY h),
j AS (
  SELECT a.mean_price AS m0, b.mean_price AS m1,
         a.urgent_rate AS u0, b.urgent_rate AS u1,
         a.n_prios AS k0, b.n_prios AS k1
  FROM agg a CROSS JOIN agg b WHERE a.h = 0 AND b.h = 1),
rows_ AS (
  SELECT 'mean_price' AS metric, ROUND(m0, 6) AS half0, ROUND(m1, 6) AS half1 FROM j
  UNION ALL
  SELECT 'urgent_rate', ROUND(u0, 6), ROUND(u1, 6) FROM j
  UNION ALL
  SELECT 'n_priorities', ROUND(k0, 6), ROUND(k1, 6) FROM j)
SELECT metric, half0, half1,
       ROUND(ABS(half0 - half1) / GREATEST(ABS(half0), 1e-12), 6) AS rel_drift
FROM rows_
ORDER BY metric
"""

QUERIES["q_profile_drift"] = QuerySpec(
    q_profile_drift,
    Q_PROFILE_DRIFT_SQL,
    "snapshot profile drift between pinned halves — per-metric rows "
    "with relative drift",
)


# ----------------------------------- session timeout sensitivity
# Per-user event gaps once; session counts at timeouts {600, 1800,
# 3600} s as parallel sums (a session starts at a null gap or a gap
# above the timeout).


def q_session_timeout_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select("user_id", "ts", "event_id").withColumn(
        "gap",
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lag("ts").over(w)),
    )
    touts = [600, 1800, 3600]
    agg = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        *[
            F.sum(
                (F.col("gap").isNull() | (F.col("gap") > t)).cast("long")
            ).alias(f"s{t}")
            for t in touts
        ],
    )
    rows = agg.select(
        "n_events",
        "n_users",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("timeout_s"),
                        F.col(f"s{t}").alias("n_sessions"),
                    )
                    for t in touts
                ]
            )
        ).alias("g"),
    )
    return rows.select(
        F.col("g.timeout_s").cast("long").alias("timeout_s"),
        F.col("g.n_sessions").cast("long").alias("n_sessions"),
        F.round(
            F.col("g.n_sessions").cast("double") / F.col("n_users").cast("double"), 6
        ).alias("sessions_per_user"),
        F.round(
            F.col("n_events").cast("double") / F.col("g.n_sessions").cast("double"),
            6,
        ).alias("events_per_session"),
    ).orderBy("timeout_s")


Q_TIMEOUT_SQL = """
WITH gaps AS (
  SELECT user_id,
         epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
         - epoch(date_trunc('second',
             LAG(CAST(ts AS TIMESTAMP))
             OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)))
             AS gap
  FROM events),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 600 THEN 1 ELSE 0 END) AS BIGINT) AS s600,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS s1800,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS s3600
  FROM gaps),
rows_ AS (
  SELECT 600 AS timeout_s, s600 AS n_sessions, n_events, n_users FROM agg
  UNION ALL SELECT 1800, s1800, n_events, n_users FROM agg
  UNION ALL SELECT 3600, s3600, n_events, n_users FROM agg)
SELECT CAST(timeout_s AS BIGINT) AS timeout_s, n_sessions,
       ROUND(CAST(n_sessions AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
           AS sessions_per_user,
       ROUND(CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
           AS events_per_session
FROM rows_
ORDER BY timeout_s
"""

QUERIES["q_session_timeout_sensitivity"] = QuerySpec(
    q_session_timeout_sensitivity,
    Q_TIMEOUT_SQL,
    "session counts under a timeout grid from ONE gap pass — "
    "parallel threshold sums, no per-timeout re-scan",
)

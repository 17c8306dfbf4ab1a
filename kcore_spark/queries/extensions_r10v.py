"""Round-10 surface extensions, batch V (SURVEY §2.3 N r10): the
web-analytics block — bounce rate per day, the session-depth
histogram, and the entry/exit event-type matrix, all derived from
the engine's sessionize operator (operators: 30-minute gap, the
q_events_sessions convention).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer session counts end-to-end; entry/exit picked by
(ts, event_id) tie-broken min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import sessionize
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_GAP_S = 1800

_SESS_SQL = f"""
flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_S}
              THEN 1
              WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1
              ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged),
ends AS (
  SELECT user_id, session_id, ts, event_type,
         FIRST_VALUE(event_type) OVER w AS entry_type,
         LAST_VALUE(event_type) OVER w AS exit_type
  FROM sess
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
per_sess AS (
  SELECT user_id, session_id,
         COUNT(*) AS n_events,
         MIN(ts) AS t0,
         ANY_VALUE(entry_type) AS entry_type,
         ANY_VALUE(exit_type) AS exit_type
  FROM ends GROUP BY user_id, session_id)
"""


def _per_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(
        ev, key="user_id", ts="ts", gap_seconds=_GAP_S, order_tiebreak="event_id"
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t0"),
        F.min_by("event_type", F.struct(F.col("ts"), F.col("event_id"))).alias(
            "entry_type"
        ),
        F.max_by("event_type", F.struct(F.col("ts"), F.col("event_id"))).alias(
            "exit_type"
        ),
    )


# ----------------------------------------------------- bounce rate
# Share of single-event sessions per session-start day — the classic
# engagement-health number. Last 10 fixture days.


def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_session(spark, sf_dir)
    daily = per.groupBy(F.to_date("t0").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).cast("long").alias("n_bounces"),
    )
    return (
        daily.orderBy(F.col("day").desc())
        .limit(10)
        .select(
            F.col("day").cast("string").alias("day"),
            "n_sessions",
            "n_bounces",
            F.round(
                F.col("n_bounces") / F.col("n_sessions").cast("double"), 6
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


Q_BOUNCE_SQL = f"""
WITH {_SESS_SQL},
daily AS (
  SELECT CAST(t0 AS DATE) AS day, COUNT(*) AS n_sessions,
         SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces
  FROM per_sess GROUP BY 1),
tail10 AS (SELECT * FROM daily ORDER BY day DESC LIMIT 10)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_bounces AS BIGINT) AS n_bounces,
       ROUND(n_bounces / CAST(n_sessions AS DOUBLE), 6) AS bounce_rate
FROM tail10
ORDER BY day
"""

QUERIES["q_bounce_rate"] = QuerySpec(
    q_bounce_rate,
    Q_BOUNCE_SQL,
    "bounce rate per session-start day (single-event sessions / all, "
    "30-min gap sessionization), last 10 fixture days",
)


# ------------------------------------------- session-depth histogram
# Events-per-session distribution in the classic depth bands.


def q_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_session(spark, sf_dir)
    band = (
        F.when(F.col("n_events") == 1, "1_single")
        .when(F.col("n_events") <= 3, "2_shallow_2_3")
        .when(F.col("n_events") <= 7, "3_medium_4_7")
        .otherwise("4_deep_8_plus")
    )
    tot = per.count()
    return (
        per.groupBy(band.alias("depth_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .withColumn(
            "session_share",
            F.round(F.col("n_sessions") / F.lit(float(tot)), 6),
        )
        .orderBy("depth_band")
    )


Q_DEPTH_SQL = f"""
WITH {_SESS_SQL},
banded AS (
  SELECT CASE WHEN n_events = 1 THEN '1_single'
              WHEN n_events <= 3 THEN '2_shallow_2_3'
              WHEN n_events <= 7 THEN '3_medium_4_7'
              ELSE '4_deep_8_plus' END AS depth_band,
         n_events
  FROM per_sess),
tot AS (SELECT COUNT(*) AS t FROM per_sess)
SELECT depth_band, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(COUNT(*) / CAST(ANY_VALUE(t) AS DOUBLE), 6) AS session_share
FROM banded, tot
GROUP BY depth_band
ORDER BY depth_band
"""

QUERIES["q_session_depth_hist"] = QuerySpec(
    q_session_depth_hist,
    Q_DEPTH_SQL,
    "session-depth histogram (events per 30-min-gap session, classic "
    "bands) — the engagement-depth profile",
)


# ------------------------------------- entry/exit event-type matrix
# First and last event type of each multi-event session — the
# entry/exit page analog. Top-10 cells by session count.


def q_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_session(spark, sf_dir).where(F.col("n_events") >= 2)
    return (
        per.groupBy("entry_type", "exit_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "entry_type", "exit_type")
        .limit(10)
    )


Q_ENTRYEXIT_SQL = f"""
WITH {_SESS_SQL}
SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM per_sess
WHERE n_events >= 2
GROUP BY entry_type, exit_type
ORDER BY n_sessions DESC, entry_type, exit_type
LIMIT 10
"""

QUERIES["q_entry_exit_matrix"] = QuerySpec(
    q_entry_exit_matrix,
    Q_ENTRYEXIT_SQL,
    "entry/exit event-type matrix of multi-event sessions (tie-broken "
    "min_by/max_by) — the landing/leaving analysis",
)

"""Round-9 surface extensions, batch AB (SURVEY §2.3 N r9): the
WITHIN-SESSION funnel — steps must complete inside one gap-session,
not a global lookback window (q_funnel_conversions is the windowed
form; product analytics usually wants the session-scoped one: a view
and a purchase a day apart are two visits, not a conversion).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
One sessionization pass (the operators/sessionize machinery the
events family shares), then ORDERED step detection per session via
min-timestamps — no joins at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_GAP_S = 1800


def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=_GAP_S, order_tiebreak="event_id")
    per_session = s.groupBy("user_id", "session_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_timestamp("ts"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "click", F.unix_timestamp("ts"))
        ).alias("first_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.unix_timestamp("ts"))
        ).alias("last_purchase"),
    )
    # ordered completion: view, then a click after it, then a purchase
    # after the click — all inside the session by construction
    step1 = F.col("first_view").isNotNull()
    step2 = step1 & F.col("first_click").isNotNull() & (
        F.col("first_click") >= F.col("first_view")
    )
    step3 = step2 & F.col("last_purchase").isNotNull() & (
        F.col("last_purchase") >= F.col("first_click")
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(step1.cast("int")).cast("long").alias("viewed"),
        F.sum(step2.cast("int")).cast("long").alias("clicked_after_view"),
        F.sum(step3.cast("int")).cast("long").alias("purchased_after_click"),
        F.round(
            F.sum(step3.cast("int")) / F.nullif(F.sum(step1.cast("int")), F.lit(0)), 6
        ).alias("session_conversion"),
    )


Q_SESSION_FUNNEL_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_S} THEN 1
              WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id,
         MIN(CASE WHEN event_type = 'view'
                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) END) AS first_view,
         MIN(CASE WHEN event_type = 'click'
                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) END) AS first_click,
         MAX(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) END) AS last_purchase
  FROM sess GROUP BY user_id, session_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click >= first_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click >= first_view
                      AND last_purchase >= first_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click,
       ROUND(SUM(CASE WHEN first_view IS NOT NULL AND first_click >= first_view
                       AND last_purchase >= first_click THEN 1 ELSE 0 END) * 1.0
             / NULLIF(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END), 0), 6)
         AS session_conversion
FROM per_session
"""

QUERIES["q_session_funnel"] = QuerySpec(
    q_session_funnel,
    Q_SESSION_FUNNEL_SQL,
    "within-session ordered funnel (view → click → purchase inside "
    "one gap-session) — sessionize + min-timestamp step detection, "
    "no joins",
)

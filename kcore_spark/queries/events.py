"""Event-stream analytics in batch form (SURVEY §2.3 I, batch-checkable).

The `events` table is the batch image of the topic log (SURVEY §1.2):
these queries give the streaming operators deterministic, oracle-
checkable semantics — the structured-streaming versions in
queries/streaming.py produce the same answers via availableNow replay.

Windows are surfaced as epoch-second BIGINT starts: Spark's window()
struct and DuckDB's date_trunc differ in type but not in instant.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import asof_join, sessionize
from kcore_spark.queries import QuerySpec

# -------------------------------------------------- JSON payload decode


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.count_distinct(k).alias("distinct_k"),
        )
        .orderBy("event_type")
    )


Q_EVENTS_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
       COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS distinct_k
FROM events
GROUP BY event_type
"""

# -------------------------------------------------- tumbling window
# groupBy(window(...)) in batch == the streaming tumbling aggregate;
# at scale this is one hash aggregate keyed on (bucket, type) — the
# bucket arithmetic is a projection, no pre-shuffle.


def q_events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


Q_EVENTS_TUMBLING_SQL = """
SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

# -------------------------------------------------- sliding window
# 10-minute windows sliding by 5: every event lands in exactly two
# buckets, start ∈ {b, b-300} for b = floor(epoch/300)*300.


def q_events_sliding_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("users"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), "n", "users")
        .orderBy("window_start")
    )


Q_EVENTS_SLIDING_SQL = """
SELECT ws AS window_start, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
FROM (
  SELECT user_id,
         UNNEST([b, b - 300]) AS ws
  FROM (SELECT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT) AS b
        FROM events))
GROUP BY ws
"""

# -------------------------------------------------- sessionization
# Batch analog of session_window(ts, '30 minutes'): shared single
# shuffle on user_id (see operators/relational.sessionize).


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
            F.unix_timestamp(F.max("ts")).alias("session_end_epoch"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


Q_EVENTS_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1
              WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1
              ELSE 0 END AS new_sess
  FROM events),
sessions AS (
  SELECT user_id, event_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       CAST(floor(epoch(MIN(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS session_start_epoch,
       CAST(floor(epoch(MAX(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS session_end_epoch,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""

# -------------------------------------------------- as-of join
# Latest order at-or-before each purchase event per user. The Spark
# side is the union-and-window rewrite (one shuffle on the key);
# the oracle is the naive join+QUALIFY, feasible only at oracle SF.


def q_asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_vals=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        # profiled shape: pair blow-up ratio 1.2 (purchases × a user's
        # orders) — the range join runs 2.8× faster than union-window
        # here, and declaring it skips the auto probe's two jobs
        strategy="range",
    )
    return out.select("event_id", "user_id", "o_orderkey", "o_totalprice").orderBy("event_id")


Q_ASOF_SQL = """
SELECT event_id, user_id, o_orderkey, o_totalprice
FROM events e
JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
WHERE e.event_type = 'purchase'
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""

# -------------------------------------------------- stream-static join shape


def q_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich events with the customer dim (broadcast) — the batch
    image of the stream-static join in queries/streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


Q_EVENTS_ENRICHED_SQL = """
SELECT c_mktsegment, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""

# -------------------------------------------------- dedup by key


def q_events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the first occurrence per (user_id, event_type) in event-time
    order — streaming dropDuplicates semantics, batch-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_timestamp("ts").alias("ts_epoch"))
        .orderBy("user_id", "event_type")
    )


Q_EVENTS_DEDUP_SQL = """
SELECT user_id, event_type, event_id,
       CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_epoch
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
"""


# -------------------------------------------------- from_json → MAP


def q_events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read payload decode: props JSON → MAP<string,string>,
    then map functions (element_at / map_keys / size)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select(
            "event_type",
            F.element_at(m, "k").cast("long").alias("k"),
            F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        )
        .groupBy("event_type", "n_keys")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("event_type", "n_keys")
    )


Q_EVENTS_PROPS_MAP_SQL = """
SELECT event_type,
       CAST(LEN(json_keys(props)) AS BIGINT) AS n_keys,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type, n_keys
"""


# -------------------------------------------------- VARIANT decode
# Spark 4's VARIANT type: parse once, path-extract many — the modern
# replacement for repeated get_json_object on the same payload.


def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select("event_type", F.variant_get(v, "$.k", "long").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q_EVENTS_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""

# -------------------------------------------------- malformed payloads
# Schema-on-read must survive corrupt payloads: PERMISSIVE decode maps
# unparseable JSON to NULL (never a task failure). Corruption is
# synthesized deterministically (every 7th event truncated) so the
# oracle can replicate it with json_valid().


def q_events_corrupt_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bad = F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 4)).otherwise(F.col("props"))
    parsed = F.from_json(bad, "map<string,string>")
    return (
        ev.select("event_type", parsed.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).cast("long").alias("n_corrupt"),
            F.sum(F.element_at("m", "k").cast("long")).alias("sum_k_valid"),
        )
        .orderBy("event_type")
    )


Q_EVENTS_CORRUPT_SQL = """
WITH mangled AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN substring(props, 1, 4) ELSE props END AS bad
  FROM events)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN NOT json_valid(bad) THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN json_valid(bad) THEN CAST(bad->>'k' AS BIGINT) END) AS BIGINT)
           AS sum_k_valid
FROM mangled
GROUP BY event_type
"""


QUERIES = {
    "q_events_corrupt_json": QuerySpec(
        q_events_corrupt_json, Q_EVENTS_CORRUPT_SQL, "PERMISSIVE decode of corrupt payloads"
    ),
    "q_events_variant": QuerySpec(q_events_variant, Q_EVENTS_VARIANT_SQL, "VARIANT payload decode"),
    "q_events_json_props": QuerySpec(q_events_json_props, Q_EVENTS_JSON_SQL, "JSON payload decode"),
    "q_events_props_map": QuerySpec(
        q_events_props_map, Q_EVENTS_PROPS_MAP_SQL, "from_json → MAP + map functions"
    ),
    "q_events_tumbling_1h": QuerySpec(q_events_tumbling_1h, Q_EVENTS_TUMBLING_SQL, "tumbling window"),
    "q_events_sliding_10m": QuerySpec(q_events_sliding_10m, Q_EVENTS_SLIDING_SQL, "sliding window"),
    "q_events_sessions": QuerySpec(q_events_sessions, Q_EVENTS_SESSIONS_SQL, "sessionization"),
    "q_asof_event_order": QuerySpec(q_asof_event_order, Q_ASOF_SQL, "as-of join (union-window)"),
    "q_events_enriched": QuerySpec(q_events_enriched, Q_EVENTS_ENRICHED_SQL, "stream-static join shape"),
    "q_events_dedup_first": QuerySpec(q_events_dedup_first, Q_EVENTS_DEDUP_SQL, "keyed dedup"),
}

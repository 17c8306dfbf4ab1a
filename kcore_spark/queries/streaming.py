"""Real Structured Streaming queries (SURVEY §2.3 I), oracle-checked.

Each callable builds a readStream pipeline, replays it to completion
with availableNow into a memory sink, and returns the materialized
result — so the driver's batch-style harness (and DuckDB oracle) can
check genuine streaming executions: watermarks, windowed state,
streaming dedup, stream-static and stream-stream joins.

Provenance: SURVEY §2.3-I. The reference declares the event-streaming
platform (`/root/reference/README.md:17,27`) with no stream processing;
this is the Structured Streaming realization of that declared model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.streaming.ops import events_stream, run_to_table

# -------------------------------------------------- tumbling window agg


def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    out = run_to_table(agg, "complete")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"), "event_type", "n", "sum_value"
    ).orderBy("window_start", "event_type")


Q_STREAM_TUMBLING_SQL = """
SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

# -------------------------------------------------- sliding window


def q_stream_sliding_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    # count_distinct is unsupported on streams; use an exact decimal sum
    agg = s.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    out = run_to_table(agg, "complete")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"), "n", "sum_value"
    ).orderBy("window_start")


Q_STREAM_SLIDING_SQL = """
SELECT ws AS window_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT value,
         UNNEST([b, b - 300]) AS ws
  FROM (SELECT value,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT) AS b
        FROM events))
GROUP BY ws
"""

# -------------------------------------------------- streaming dedup


def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = s.dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_table(agg, "complete").orderBy("event_type")


Q_STREAM_DEDUP_SQL = """
SELECT event_type, COUNT(*) AS n
FROM (SELECT event_type FROM events
      QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) = 1)
GROUP BY event_type
"""

# -------------------------------------------------- session windows


def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = s.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = run_to_table(agg, "complete")
    return out.select(
        "user_id", F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"), "n_events"
    ).orderBy("user_id", "session_start_epoch")


# Gap-based sessionization is the batch image of session_window; the
# session start is the first event's timestamp in the merged window.
Q_STREAM_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 THEN 1
              WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events),
sessions AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id,
       CAST(floor(epoch(MIN(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS session_start_epoch,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sid
"""

# -------------------------------------------------- stream-static join


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    joined = s.join(F.broadcast(cust), s.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_table(agg, "complete").orderBy("c_mktsegment", "event_type")


Q_STREAM_STATIC_SQL = """
SELECT c_mktsegment, event_type, COUNT(*) AS n
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""

# -------------------------------------------------- stream-stream join
# view→purchase conversions: each purchase joined to the same user's
# views in the preceding 10 minutes; watermarks bound the join state.


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_event"))
        .withWatermark("p_ts", "30 minutes")
    )
    joined = purchases.join(
        views,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts"
        ),
    )
    out = run_to_table(joined.select("p_event", "p_user"), "append")
    return (
        out.groupBy("p_user")
        .agg(F.count(F.lit(1)).alias("n_view_purchase_pairs"))
        .orderBy("p_user")
    )


Q_STREAM_STREAM_SQL = """
SELECT p.user_id AS p_user, COUNT(*) AS n_view_purchase_pairs
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 10 MINUTE
 AND v.ts < p.ts
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
GROUP BY p.user_id
"""

# -------------------------------------------------- stream-stream OUTER join
# The outer variant is a genuinely different operator from the inner
# join: unmatched left rows are held in state and emitted with nulls
# only when the watermark proves no match can still arrive — i.e. the
# null rows are produced by state EVICTION, not by the join probe.
# Determinism vs the batch oracle: at end-of-stream the final no-data
# batch advances the watermark to max(ts) − 30 min, which evicts (and
# emits) every unmatched purchase with p_ts below that line; purchases
# in the last half hour may still be parked in state when the replay
# stops. Both engines therefore cut the result at max(ts) − 2 h — well
# inside the provably-evicted region — so the comparison covers only
# rows whose emission is guaranteed.


def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.catalog import load_table

    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = purchases.join(
        views,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts"
        ),
        "leftOuter",
    )
    out = run_to_table(joined.select("p_user", "p_ts", "v_ts"), "append")
    # control-plane scalar: the eviction-safe cutoff (1-row aggregate)
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("c")
    ).first()[0]
    return (
        out.where(F.col("p_ts") <= F.lit(cutoff))
        .groupBy("p_user")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v_ts").isNull().cast("long")).alias("n_unmatched"),
        )
        .orderBy("p_user")
    )


Q_STREAM_STREAM_LEFT_SQL = """
WITH cut AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 2 HOUR AS c FROM events),
p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id AS vu, CAST(ts AS TIMESTAMP) AS vts FROM events WHERE event_type = 'view')
SELECT p.user_id AS p_user, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN vts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM p LEFT JOIN v
  ON p.user_id = vu
 AND vts >= p.ts - INTERVAL 10 MINUTE
 AND vts < p.ts
WHERE p.ts <= (SELECT c FROM cut)
GROUP BY p.user_id
ORDER BY p_user
"""


def q_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join: null rows on BOTH sides come
    from state eviction — an unmatched purchase emits (p, null) and an
    unmatched view emits (null, v) only when the watermark proves no
    partner can still arrive. Determinism vs the batch oracle uses the
    same end-of-stream cutoff argument as the LEFT variant, applied on
    both sides (a row whose event time is ≤ max(ts) − 2h has had its
    full join window watermark-closed by the final no-data batch)."""
    from kcore_spark.catalog import load_table

    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "30 minutes")
    )
    joined = purchases.join(
        views,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts"
        ),
        "fullOuter",
    )
    out = run_to_table(joined.select("p_user", "p_ts", "v_user", "v_ts"), "append")
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("c")).first()[0]
    # classify each emitted row; user key comes from whichever side is present
    keyed = out.where(
        F.coalesce(F.col("p_ts"), F.col("v_ts")) <= F.lit(cutoff)
    ).select(
        F.coalesce(F.col("p_user"), F.col("v_user")).alias("user_id"),
        F.when(F.col("p_ts").isNull(), F.lit("view_only"))
        .when(F.col("v_ts").isNull(), F.lit("purchase_only"))
        .otherwise(F.lit("matched"))
        .alias("kind"),
    )
    return (
        keyed.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("kind")
    )


Q_STREAM_STREAM_FULL_SQL = """
WITH cut AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 2 HOUR AS c FROM events),
p AS (SELECT user_id AS pu, CAST(ts AS TIMESTAMP) AS pts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id AS vu, CAST(ts AS TIMESTAMP) AS vts FROM events WHERE event_type = 'view'),
j AS (
  SELECT pu, pts, vu, vts
  FROM p FULL OUTER JOIN v
    ON pu = vu AND vts >= pts - INTERVAL 10 MINUTE AND vts < pts),
keyed AS (
  SELECT COALESCE(pu, vu) AS user_id,
         CASE WHEN pts IS NULL THEN 'view_only'
              WHEN vts IS NULL THEN 'purchase_only'
              ELSE 'matched' END AS kind
  FROM j
  WHERE COALESCE(pts, vts) <= (SELECT c FROM cut))
SELECT kind, COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users
FROM keyed
GROUP BY kind
ORDER BY kind
"""



# -------------------------------------------------- custom stateful op
# applyInPandasWithState: arbitrary per-key state kept by the engine
# across micro-batches (the "custom stateful operator" row of §2.3 I).
# State here: running (n_events, sum_k); each batch emits the updated
# totals, so after availableNow replay the memory sink's last row per
# key equals the batch aggregate — which is the oracle.


def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += int(pdf["props"].map(lambda p: _json.loads(p)["k"]).sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_k": [s]})

    s = events_stream(spark, sf_dir)
    out = s.select("user_id", "props").groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id long, n_events long, sum_k long",
        stateStructType="n long, s long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    res = run_to_table(out, "update")
    # last emission per key is the final state
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        res.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_k")
        .orderBy("user_id")
    )


Q_STREAM_STATEFUL_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY user_id
"""


# ------------------------------------ exactly-once topic sink e2e


def q_stream_topic_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → streaming foreachBatch topic sink (exactly-once batch
    commits riding the produce watermark flip) → batch scan of the
    sunk topic → per-type counts. The oracle computes the same counts
    straight from the events table, so a hash match proves the full
    stream→topic→scan loop is lossless AND duplicate-free — the replay
    of the stream from a fresh checkpoint re-delivers every batch, and
    only the sink's batch-id commits keep the topic exact."""
    import tempfile

    from kcore_spark.sources.topic_log import TopicLog
    from kcore_spark.streaming.ops import events_stream
    from kcore_spark.streaming.sinks import topic_sink

    log = TopicLog(spark, tempfile.mkdtemp(prefix="kcore_q_sink_"))
    log.create_topic("sunk", 2)

    def to_records(df: DataFrame) -> DataFrame:
        return df.select(
            F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
            F.encode(F.col("event_type"), "utf-8").alias("value"),
            F.col("ts").alias("timestamp"),
            "event_id",
        )

    ckpt = tempfile.mkdtemp(prefix="kcore_q_sink_ckpt_")
    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(
            topic_sink(log, "sunk", sink_id="q", order_by=["event_id"], transform=to_records)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        log.scan("sunk")
        .select(F.decode("value", "utf-8").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


Q_STREAM_TOPIC_SINK_SQL = """
SELECT event_type, COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""



def q_stream_dlq_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue routing — the production ingest shape: one
    streaming pass splits records into a MAIN topic (parseable
    payloads) and a DLQ topic (corrupt payloads, kept for replay after
    a parser fix), both through the exactly-once foreachBatch topic
    sink, then audits both topics with a batch scan. Corruption is the
    same deterministic mangling q_events_corrupt_json pins (event_id %
    7 truncates the JSON), so the oracle recomputes the split
    relationally: a hash match proves the router sent every record to
    exactly one topic with no loss and no duplicates."""
    import tempfile

    from kcore_spark.sources.topic_log import TopicLog
    from kcore_spark.streaming.ops import events_stream
    from kcore_spark.streaming.sinks import topic_sink

    log = TopicLog(spark, tempfile.mkdtemp(prefix="kcore_q_dlq_"))
    log.create_topic("main", 2)
    log.create_topic("dlq", 1)

    bad = F.when(
        F.col("event_id") % 7 == 0, F.substring("props", 1, 4)
    ).otherwise(F.col("props"))

    def route(df: DataFrame, batch_id: int) -> None:
        routed = df.withColumn("payload", bad).withColumn(
            "parsed", F.from_json(F.col("payload"), "map<string,string>")
        )
        main_sink = topic_sink(
            log,
            "main",
            sink_id="dlq_main",
            order_by=["event_id"],
            transform=lambda d: d.where(F.col("parsed").isNotNull()).select(
                F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
                F.encode(F.col("event_type"), "utf-8").alias("value"),
                F.col("ts").alias("timestamp"),
                "event_id",
            ),
        )
        dlq_sink = topic_sink(
            log,
            "dlq",
            sink_id="dlq_dead",
            order_by=["event_id"],
            transform=lambda d: d.where(F.col("parsed").isNull()).select(
                F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
                F.encode(F.col("payload"), "utf-8").alias("value"),
                F.col("ts").alias("timestamp"),
                "event_id",
            ),
        )
        main_sink(routed, batch_id)
        dlq_sink(routed, batch_id)

    ckpt = tempfile.mkdtemp(prefix="kcore_q_dlq_ckpt_")
    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(route)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    main_n = log.scan("main").count()
    dlq_n = log.scan("dlq").count()
    return spark.createDataFrame(
        [("dlq", dlq_n), ("main", main_n)], "topic string, n long"
    ).orderBy("topic")


Q_STREAM_DLQ_SQL = """
SELECT 'dlq' AS topic, COUNT(*) AS n FROM events WHERE event_id % 7 = 0
UNION ALL
SELECT 'main', COUNT(*) FROM events WHERE event_id % 7 <> 0
ORDER BY topic
"""




# -------------------------------------------------- stream union
# Two branches of the source stream — purchases, and high-value
# non-purchase events — unioned back into ONE streaming plan and
# aggregated per (hour, branch). Union of streams is the multi-feed
# ingestion shape (N topics -> one pipeline); Spark runs both branches
# off a shared source scan in the same micro-batch, and the windowed
# state is keyed by (window, branch) exactly like a single-feed agg.


def q_stream_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir)
    purchases = s.where(F.col("event_type") == "purchase").select(
        "ts", F.lit("purchase").alias("branch"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    high = s.where(
        (F.col("event_type") != "purchase") & (F.col("value") > 90.0)
    ).select(
        "ts", F.lit("high_value").alias("branch"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    both = purchases.unionByName(high).withWatermark("ts", "1 hour")
    agg = both.groupBy(F.window("ts", "1 hour").alias("w"), "branch").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("sum_value"),
    )
    out = run_to_table(agg, "complete")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "branch",
        "n",
        "sum_value",
    ).orderBy("window_start", "branch")


Q_STREAM_UNION_SQL = """
SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
       branch, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT ts, 'purchase' AS branch, value FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT ts, 'high_value' AS branch, value FROM events
  WHERE event_type <> 'purchase' AND value > 90.0)
GROUP BY 1, 2
"""

QUERIES = {
    "q_stream_stream_full_join": QuerySpec(
        q_stream_stream_full_join,
        Q_STREAM_STREAM_FULL_SQL,
        "stream-stream FULL OUTER join (two-sided eviction nulls)",
    ),
    "q_stream_dlq_split": QuerySpec(
        q_stream_dlq_split,
        Q_STREAM_DLQ_SQL,
        "DLQ routing: one stream, two exactly-once topic sinks",
    ),
    "q_stream_topic_sink_roundtrip": QuerySpec(
        q_stream_topic_sink_roundtrip,
        Q_STREAM_TOPIC_SINK_SQL,
        "stream → exactly-once topic sink → scan round-trip",
    ),
    "q_stream_stateful_user_stats": QuerySpec(
        q_stream_stateful_user_stats, Q_STREAM_STATEFUL_SQL, "applyInPandasWithState"
    ),
    "q_stream_union_counts": QuerySpec(
        q_stream_union_counts,
        Q_STREAM_UNION_SQL,
        "union of two stream branches into one windowed agg (multi-feed shape)",
    ),
    "q_stream_tumbling_counts": QuerySpec(
        q_stream_tumbling_counts, Q_STREAM_TUMBLING_SQL, "streaming tumbling window"
    ),
    "q_stream_sliding_10m": QuerySpec(
        q_stream_sliding_10m, Q_STREAM_SLIDING_SQL, "streaming sliding window"
    ),
    "q_stream_dedup_counts": QuerySpec(
        q_stream_dedup_counts, Q_STREAM_DEDUP_SQL, "dropDuplicatesWithinWatermark"
    ),
    "q_stream_session_windows": QuerySpec(
        q_stream_session_windows, Q_STREAM_SESSION_SQL, "session_window state"
    ),
    "q_stream_static_join": QuerySpec(q_stream_static_join, Q_STREAM_STATIC_SQL, "stream-static join"),
    "q_stream_stream_join": QuerySpec(q_stream_stream_join, Q_STREAM_STREAM_SQL, "stream-stream join"),
    "q_stream_stream_left_join": QuerySpec(
        q_stream_stream_left_join,
        Q_STREAM_STREAM_LEFT_SQL,
        "stream-stream LEFT OUTER join (watermark state eviction)",
    ),
}


# ------------------------------ timeout-driven sessionization
# The event-time-timeout half of the custom-stateful surface
# (q_stream_stateful_user_stats covers NoTimeout accumulation): open
# sessions live in state with a timeout at last_event + gap; the
# engine fires hasTimedOut when the WATERMARK passes that instant —
# i.e. session closing is driven by event-time progress, exactly how a
# production sessionizer works. The fixture streams as 6 chronological
# chunks (events_stream_chunked) so watermarks genuinely advance and
# timeouts fire mid-stream, not just at shutdown. In-batch gaps are
# split inside the function (a chunk can contain a 30-minute silence);
# the state machinery handles the CROSS-batch continuations and the
# final eviction. Determinism cut: sessions ending in the last 2 hours
# may still be open when the replay stops (watermark delay + gap ≈ 1 h
# eviction lag), so both engines compare only sessions ending before
# max(ts) − 2 h — same stance as the stream-stream outer join.

SESSION_GAP_MS = 30 * 60 * 1000


def _timeout_sessions_groupstate(stream_df: DataFrame) -> DataFrame:
    """Gap sessionization on the GroupState (applyInPandasWithState)
    engine over an already-watermarked stream; returns the raw closed
    sessions. The per-batch fold is tws.fold_sessions — the same state
    machine the transformWithState processor runs."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from kcore_spark.streaming.tws import fold_sessions

    def track(key, pdf_iter, state: GroupState):
        closed = []  # (start_ms, end_ms, n)
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((start, last, n))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            ts_all = []
            for pdf in pdf_iter:
                ts_all.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
            ts_all.sort()
            closed2, cur = fold_sessions(ts_all, cur, SESSION_GAP_MS)
            closed.extend(closed2)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(cur[1] + SESSION_GAP_MS)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "start_ms": [c[0] for c in closed],
                    "end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    # project to the two columns the fold reads BEFORE the keyed
    # shuffle: the state exchange and the Arrow transfer to the Python
    # state server shrink ~4x (props/event_type never leave the JVM) —
    # measured 13-18s -> 9-10s at sf0.1 on the TWS twin of this fold
    out = stream_df.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id long, start_ms long, end_ms long, n_events long",
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # state_partitions=None: unlike the small-state windowed aggs, the
    # bottleneck here is per-GROUP Python stateful processing (150 users
    # × 7 micro-batches through the pandas state server), which
    # parallelizes with partitions — measured 10.4s at 32 vs 13.7s at 8
    # at sf0.1. Inherit the session's full parallelism.
    return run_to_table(out, "append", state_partitions=None)


def q_stream_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.streaming.ops import events_stream_chunked

    # 2 replay chunks (r9, was 3): the session fold is chunk-count
    # invariant (gaps close sessions inline; the final no-data batch
    # fires every timer the end-of-stream watermark passes), so replay
    # cost scales with trigger count alone — warm sf0.1: 6 chunks
    # 14.3s, 3 chunks 6.9s, 2 chunks 5.5s, identical output. 2 is the
    # floor that still proves the state machinery: one mid-stream
    # watermark advance (batch-2 state carry + mid-stream timer fires)
    # plus the final eviction batch.
    s = events_stream_chunked(spark, sf_dir, n_chunks=2).withWatermark(
        "ts", "30 minutes"
    )
    res = _timeout_sessions_groupstate(s)
    # eviction-safe cutoff (control-plane 1-row aggregate)
    from kcore_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff_ms = ev.agg(
        (F.unix_timestamp(F.max("ts")) * 1000 - 2 * 3600 * 1000).alias("c")
    ).first()[0]
    return (
        res.where(F.col("end_ms") <= F.lit(cutoff_ms))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(
                F.expr("(end_ms - start_ms) div 1000")
            ).alias("longest_s"),
        )
        .orderBy("user_id")
    )


Q_STREAM_TIMEOUT_SESSIONS_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) * 1000) AS BIGINT) AS ts_ms
  FROM events),
cutoff AS (SELECT MAX(ts_ms) - 2 * 3600 * 1000 AS c FROM ev),
marked AS (
  SELECT user_id, ts_ms,
         CASE WHEN ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
                   > 30 * 60 * 1000
              OR LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM ev),
sess AS (
  SELECT user_id, ts_ms,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked),
sessions AS (
  SELECT user_id, sid, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
         COUNT(*) AS n
  FROM sess
  GROUP BY user_id, sid)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       MAX((end_ms - start_ms) // 1000) AS longest_s
FROM sessions
WHERE end_ms <= (SELECT c FROM cutoff)
GROUP BY user_id
ORDER BY user_id
"""


QUERIES["q_stream_timeout_sessions"] = QuerySpec(
    q_stream_timeout_sessions,
    Q_STREAM_TIMEOUT_SESSIONS_SQL,
    "event-time-timeout sessionization (applyInPandasWithState)",
)


# ------------------------------ transformWithState sessionization
# Spark 4.x forward API for custom keyed state — processor class,
# shared session fold, scale notes and the protobuf environment gate
# all live in kcore_spark/streaming/tws.py (unit-tested against a
# pure-Python engine fake in tests/test_tws.py). Same semantics and
# oracle as q_stream_timeout_sessions: one state machine, two engines.


def q_stream_tws_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.streaming.tws import tws_usable, SESSION_GAP_MS as GAP
    from kcore_spark.streaming.ops import events_stream_chunked

    # 2 chunks (r9, was 3) for the same chunk-invariance reason as
    # q_stream_timeout_sessions; with the real TWS engine each trigger
    # re-opens one RocksDB store per state partition, so trigger count
    # is the dominant cost — warm sf0.1 A/B: 3 chunks/8 parts 11.6s,
    # 2/8 9.1s, 2/4 9.2s, 2/2 13.6s (fewer stores lose scan
    # parallelism). One mid-stream watermark advance still exercises
    # cross-batch ValueState carry and mid-stream timer fires.
    s = events_stream_chunked(spark, sf_dir, n_chunks=2).withWatermark(
        "ts", "30 minutes"
    )
    if tws_usable(spark):  # real engine, and THIS session's JVM can spawn its worker
        from kcore_spark.streaming.tws import make_session_processor

        # the processor folds ts only — dropping the other columns
        # before the keyed shuffle shrinks the exchange AND the Arrow
        # transfer to the Python worker (props is the fat column);
        # measured 13-18s -> 9-10s at sf0.1, identical 95,345 rows
        out = s.select("user_id", "ts").groupBy("user_id").transformWithStateInPandas(
            make_session_processor(GAP)(),
            outputStructType="user_id long, start_ms long, end_ms long, n_events long",
            outputMode="append",
            timeMode="eventTime",
        )
        # transformWithState requires the RocksDB provider; the helper
        # scopes it (plus changelog checkpointing) to this one run so
        # the small-state windowed aggs keep their zero-setup
        # in-memory store. Partition/checkpoint tuning rationale and
        # measurements live on run_tws_to_table.
        from kcore_spark.streaming.ops import run_tws_to_table

        res = run_tws_to_table(out, "append", state_partitions=8)
    else:
        # Neither a real protobuf wheel nor the vendored runtime
        # imported (streaming/tws.py docstring): run the SAME fold
        # through the GroupState engine so the oracle entry stays
        # honest about semantics while the processor class itself is
        # covered by tests/test_tws.py.
        res = _timeout_sessions_groupstate(s)
    from kcore_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff_ms = ev.agg(
        (F.unix_timestamp(F.max("ts")) * 1000 - 2 * 3600 * 1000).alias("c")
    ).first()[0]
    return (
        res.where(F.col("end_ms") <= F.lit(cutoff_ms))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(F.expr("(end_ms - start_ms) div 1000")).alias("longest_s"),
        )
        .orderBy("user_id")
    )


QUERIES["q_stream_tws_sessions"] = QuerySpec(
    q_stream_tws_sessions,
    Q_STREAM_TIMEOUT_SESSIONS_SQL,
    "event-time-timer sessionization (transformWithStateInPandas; "
    "GroupState engine fallback while the container lacks protobuf)",
)

# A SECOND transformWithState query, exercising the MAP-state variable
# through the real JVM bridge (ListState/MapState are engine-tested in
# tests/test_tws.py; this puts MapState under the value-hash oracle
# too). Cumulative per-(user, event_type) counts with per-batch emits:
# the processor yields its running counts each trigger, so the FINAL
# count per pair is the max over emits — which must equal the plain
# batch GROUP BY, the oracle.


def q_stream_tws_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.streaming.tws import tws_usable
    from kcore_spark.streaming.ops import events_stream_chunked

    # 2 chunks: enough to prove cross-trigger MapState carry (batch 2
    # must see batch 1's counts) at half the RocksDB setup cost of the
    # session replay's 3.
    s = events_stream_chunked(spark, sf_dir, n_chunks=2).where(
        F.col("user_id") % 5 == 0
    )
    if tws_usable(spark):
        from kcore_spark.streaming.tws import make_distinct_counter_processor

        out = s.select("user_id", "event_type").groupBy(
            "user_id"
        ).transformWithStateInPandas(
            make_distinct_counter_processor()(),
            outputStructType="user_id long, event_type string, n long",
            outputMode="append",
            timeMode="none",
        )
        from kcore_spark.streaming.ops import run_tws_to_table

        res = run_tws_to_table(out, "append", state_partitions=8)
        final = res.groupBy("user_id", "event_type").agg(F.max("n").alias("n"))
    else:
        # honest streaming fallback: the same cumulative count as a
        # complete-mode streaming aggregation (state carried by the
        # built-in agg operator instead of MapState)
        final = run_to_table(
            s.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n")),
            "complete",
            state_partitions=16,
        )
    return (
        final.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("n").cast("long").alias("n_events"),
            F.max_by("event_type", F.struct(F.col("n"), F.col("event_type"))).alias(
                "top_type"
            ),
        )
        .orderBy("user_id")
    )


Q_STREAM_TWS_TYPE_COUNTS_SQL = """
WITH per AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events WHERE user_id % 5 = 0
  GROUP BY user_id, event_type),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY n DESC, event_type DESC) AS rnk
  FROM per)
SELECT user_id, COUNT(*) AS n_types, CAST(SUM(n) AS BIGINT) AS n_events,
       MAX(CASE WHEN rnk = 1 THEN event_type END) AS top_type
FROM ranked
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["q_stream_tws_type_counts"] = QuerySpec(
    q_stream_tws_type_counts,
    Q_STREAM_TWS_TYPE_COUNTS_SQL,
    "cumulative per-type counts via transformWithState MapState (real JVM bridge)",
)


# Third transformWithState query — the LIST-state variable under the
# oracle (ValueState+timers: q_stream_tws_sessions; MapState:
# q_stream_tws_type_counts). Running top-k per key emits its current
# leaderboard every trigger; because the k-th best so far is monotone
# nondecreasing over batches, the FINAL rank-r value is the max over
# that rank's emits — which must equal the batch top-k, the oracle.


def q_stream_tws_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.streaming.tws import tws_usable
    from kcore_spark.streaming.ops import events_stream_chunked

    s = events_stream_chunked(spark, sf_dir, n_chunks=2).where(
        F.col("user_id") % 25 == 0
    )
    if tws_usable(spark):
        from kcore_spark.streaming.tws import make_topk_processor

        out = s.select("user_id", "value").groupBy(
            "user_id"
        ).transformWithStateInPandas(
            make_topk_processor(3)(),
            outputStructType="user_id long, rank int, value double",
            outputMode="append",
            timeMode="none",
        )
        from kcore_spark.streaming.ops import run_tws_to_table

        res = run_tws_to_table(out, "append", state_partitions=8)
        final = res.groupBy("user_id", "rank").agg(F.max("value").alias("value"))
    else:
        # honest streaming fallback: complete-mode per-key top-3 via
        # the built-in streaming aggregation (collect + sort per key)
        agg = run_to_table(
            s.groupBy("user_id").agg(F.collect_list("value").alias("vs")),
            "complete",
            state_partitions=16,
        )
        final = agg.select(
            "user_id",
            F.posexplode(
                F.slice(F.sort_array(F.col("vs"), asc=False), 1, 3)
            ).alias("pos", "value"),
        ).select("user_id", (F.col("pos") + 1).alias("rank"), "value")
    return final.select(
        "user_id", F.col("rank").cast("long").alias("rank"), F.round("value", 6).alias("value")
    ).orderBy("user_id", "rank")


Q_STREAM_TWS_TOPK_SQL = """
WITH ranked AS (
  SELECT user_id, CAST(value AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(value AS DOUBLE) DESC) AS rnk
  FROM events WHERE user_id % 25 = 0)
SELECT user_id, CAST(rnk AS BIGINT) AS rank, ROUND(v, 6) AS value
FROM ranked
WHERE rnk <= 3
ORDER BY user_id, rank
"""

QUERIES["q_stream_tws_topk"] = QuerySpec(
    q_stream_tws_topk,
    Q_STREAM_TWS_TOPK_SQL,
    "running per-key top-3 via transformWithState ListState (real JVM bridge)",
)


# Fifth transformWithState mechanism under the oracle: STATE TTL
# (ValueState with ttlDurationMs — RocksDB tracks per-value expiry in
# TTL column families). The TTL is set to 1h of processing time, far
# beyond the seconds-long replay, so state never expires and the
# cumulative count must equal the batch GROUP BY — the pin is that the
# TTL-enabled state plumbing round-trips values exactly; eviction
# itself is wall-clock semantics, tested engine-side by Spark.


def q_stream_tws_ttl_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.streaming.tws import tws_usable
    from kcore_spark.streaming.ops import events_stream_chunked

    s = events_stream_chunked(spark, sf_dir, n_chunks=2).where(
        F.col("user_id") % 10 == 3
    )
    if tws_usable(spark):
        from kcore_spark.streaming.tws import make_ttl_counter_processor

        # TTL requires processing-time mode (the engine refuses TTL
        # under timeMode="none"), and proc-time mode keeps scheduling
        # cleanup batches after the source drains — run through the
        # drain-and-stop harness, not availableNow's self-termination
        out = s.select("user_id").groupBy("user_id").transformWithStateInPandas(
            make_ttl_counter_processor(3_600_000)(),
            outputStructType="user_id long, n long",
            outputMode="append",
            timeMode="processingTime",
        )
        from kcore_spark.streaming.ops import run_tws_drain_to_table

        res = run_tws_drain_to_table(out, "append", state_partitions=8)
        final = res.groupBy("user_id").agg(F.max("n").alias("n"))
    else:
        final = run_to_table(
            s.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")),
            "complete",
            state_partitions=16,
        )
    return final.select("user_id", "n").orderBy("user_id")


Q_STREAM_TWS_TTL_SQL = """
SELECT user_id, COUNT(*) AS n
FROM events WHERE user_id % 10 = 3
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["q_stream_tws_ttl_counts"] = QuerySpec(
    q_stream_tws_ttl_counts,
    Q_STREAM_TWS_TTL_SQL,
    "cumulative counts in a TTL'd ValueState (transformWithState state-TTL "
    "surface; TTL beyond replay wall-clock so the count is deterministic)",
)


# --------------------- chained stateful operators (Spark 3.5+/4)
# TWO windowed aggregations in ONE streaming query — the multi-level
# rollup (10-minute pre-aggregate → hourly rollup) that older Spark
# required two queries + an intermediate sink for. The first agg runs
# in append semantics (only watermark-finalized 10-min windows flow
# down); the second re-windows them via window_time(). Determinism:
# the eviction-safe cutoff (2h below max event time, far under the
# final 30-min watermark) keeps only hourly windows whose EVERY
# 10-min child was finalized and emitted, so the result equals the
# batch two-level rollup. Scale: state at level 1 is (10-min window ×
# type)-keyed, level 2 hourly-keyed — both bounded by time range, not
# stream length; one shuffle per level.


def q_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.streaming.ops import events_stream_chunked

    s = events_stream_chunked(spark, sf_dir, n_chunks=2).withWatermark(
        "ts", "30 minutes"
    )
    w10 = s.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    hourly = w10.groupBy(
        F.window(F.window_time("w"), "1 hour").alias("h")
    ).agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("sv").cast("double").alias("sum_value"),
    )
    res = run_to_table(hourly, "append", state_partitions=8)
    from kcore_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.unix_timestamp(F.max("ts")) - 2 * 3600).alias("c")
    ).first()[0]
    return (
        res.where(F.unix_timestamp(F.col("h.end")) <= F.lit(cutoff))
        .select(
            F.unix_timestamp(F.col("h.start")).alias("window_start"),
            "n_events",
            "n_cells",
            "sum_value",
        )
        .orderBy("window_start")
    )


Q_STREAM_CHAINED_SQL = """
WITH cutoff AS (
  SELECT MAX(epoch(CAST(ts AS TIMESTAMP))) - 2 * 3600 AS c FROM events),
cells AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         to_timestamp(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 600) * 600) AS w10,
         event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sv
  FROM events
  GROUP BY 1, 2, 3)
SELECT CAST(epoch(h) AS BIGINT) AS window_start,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_cells,
       CAST(SUM(sv) AS DOUBLE) AS sum_value
FROM cells
WHERE epoch(h) + 3600 <= (SELECT c FROM cutoff)
GROUP BY h
ORDER BY window_start
"""

QUERIES["q_stream_chained_windows"] = QuerySpec(
    q_stream_chained_windows,
    Q_STREAM_CHAINED_SQL,
    "chained stateful streaming aggs: 10-min pre-aggregate re-windowed to an "
    "hourly rollup via window_time() in one query (Spark multi-stateful)",
)



# ------------------------- transformWithState WARM START (initialState)
# The checkpoint-migration path: transformWithState's initialState=
# parameter seeds per-key state BEFORE the first batch, exercising
# handleInitialState through the real JVM bridge (previously only
# engine-fake covered, tests/test_tws.py). Contract under the oracle:
#   batch-closed sessions of the FIRST half of the stream
#   ∪ streamed SECOND half seeded with the sessions still open at the
#     split point
# must equal the full-stream sessionization — the same answer (and
# the same DuckDB oracle) as q_stream_timeout_sessions. A session is
# open at split T iff last_event + gap > T; only a user's last
# first-half session can satisfy that, so the seed is one row per key,
# exactly the shape a migrated state snapshot has.


def q_stream_tws_warm_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.catalog import load_table
    from kcore_spark.streaming.tws import tws_usable, SESSION_GAP_MS as GAP
    from kcore_spark.streaming.ops import events_stream_chunked

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("CAST(FLOOR(unix_micros(ts) / 1000) AS BIGINT)").alias("ts_ms")
    )
    lo, hi = ev.agg(F.min("ts_ms"), F.max("ts_ms")).first()
    split_ms = lo + (hi - lo) // 2  # control-plane 1-row aggregate
    cutoff_ms = hi - 2 * 3600 * 1000

    # batch sessionization of the first half (the "prior run")
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    first_half = ev.where(F.col("ts_ms") <= split_ms)
    marked = first_half.withColumn(
        "is_new",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > GAP),
            1,
        ).otherwise(0),
    )
    sessions = (
        marked.withColumn(
            "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    closed_batch = sessions.where(F.col("end_ms") + GAP <= split_ms).select(
        "user_id", "start_ms", "end_ms", "n_events"
    )
    open_at_split = sessions.where(F.col("end_ms") + GAP > split_ms).select(
        "user_id",
        "start_ms",
        F.col("end_ms").alias("last_ms"),
        "n_events",
    )

    s = events_stream_chunked(spark, sf_dir, n_chunks=2).where(
        F.expr(f"unix_micros(ts) / 1000 > {split_ms}")
    ).withWatermark("ts", "30 minutes")
    if tws_usable(spark):
        from kcore_spark.streaming.tws import make_session_processor
        from kcore_spark.streaming.ops import run_to_table

        out = s.select("user_id", "ts").groupBy("user_id").transformWithStateInPandas(
            make_session_processor(GAP)(),
            outputStructType="user_id long, start_ms long, end_ms long, n_events long",
            outputMode="append",
            timeMode="eventTime",
            initialState=open_at_split.groupBy("user_id"),
        )
        from kcore_spark.streaming.ops import run_tws_to_table

        streamed = run_tws_to_table(out, "append", state_partitions=8)
        res = streamed.unionByName(closed_batch)
    else:
        # no real bridge in this environment: the equivalence can't be
        # exercised, so run the one-engine fold over the FULL stream
        # (same final table; the warm-start path stays engine-fake
        # covered in tests/test_tws.py)
        full = events_stream_chunked(spark, sf_dir, n_chunks=2).withWatermark(
            "ts", "30 minutes"
        )
        res = _timeout_sessions_groupstate(full)
    return (
        res.where(F.col("end_ms") <= F.lit(cutoff_ms))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(F.expr("(end_ms - start_ms) div 1000")).alias("longest_s"),
        )
        .orderBy("user_id")
    )


QUERIES["q_stream_tws_warm_start"] = QuerySpec(
    q_stream_tws_warm_start,
    Q_STREAM_TIMEOUT_SESSIONS_SQL,
    "transformWithState initialState warm start: batch-closed + seeded stream "
    "second half == full sessionization (real JVM bridge)",
)


# ------------------------------------- state-store batch introspection


def q_stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 state-store READER: run the tumbling aggregation in
    APPEND mode (1h watermark) to a checkpoint, then read the
    operator's surviving keyed state back as a batch DataFrame with
    ``spark.read.format("statestore")`` — the state-debugging /
    state-migration path a production stateful pipeline needs. The
    surviving state is exactly the still-open windows (window end
    above the final watermark = max event time − 1h), so the oracle
    recomputes those windows relationally. The read scales with STATE
    size, not history — each state partition is read in parallel."""
    import tempfile
    import uuid as _uuid

    from kcore_spark.streaming.ops import run_to_table_with_ckpt

    ckpt = tempfile.mkdtemp(prefix="kcore_statereader_")
    s = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    run_to_table_with_ckpt(agg, ckpt, f"ssr_{_uuid.uuid4().hex[:12]}", "append")
    st = spark.read.format("statestore").load(ckpt)
    return (
        st.select(
            F.unix_timestamp(F.col("key.window.start")).alias("window_start"),
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").alias("n"),
        )
        .orderBy("window_start", "event_type")
    )


Q_STREAM_STATE_READER_SQL = """
WITH wm AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR AS w FROM events),
wins AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type
  FROM events)
SELECT CAST(epoch(ws) AS BIGINT) AS window_start, event_type, COUNT(*) AS n
FROM wins CROSS JOIN wm
WHERE ws + INTERVAL 1 HOUR > wm.w
GROUP BY ws, event_type
ORDER BY window_start, event_type
"""

QUERIES["q_stream_state_reader"] = QuerySpec(
    q_stream_state_reader,
    Q_STREAM_STATE_READER_SQL,
    "statestore batch source: read an append-mode agg's surviving windowed state",
)

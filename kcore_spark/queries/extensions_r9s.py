"""Round-9 surface extensions, batch S (SURVEY §2.3 N r9): two
streaming-semantics rows — the stream-to-SCD2 validity-window join
(late-binding dimension lookup: each event resolves the attribute
that was CURRENT at its effective time, not at processing time), and
deterministic LATE-DATA accounting (a staged out-of-order chunk makes
the watermark actually drop rows, and the oracle reproduces exactly
which).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import ensure_engine_confs, load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec
from kcore_spark.streaming.ops import events_stream, run_to_table

QUERIES: dict[str, QuerySpec] = {}


# ---------------------- stream → SCD2 validity-window join
# The q_stream_static_join row joins the CURRENT dimension; real
# pipelines need the dimension AS OF the event time. The SCD2 history
# (the q_scd2_history build, rebuilt here batch-side) is broadcast and
# the stream probes it with a validity-range condition — per event
# exactly one version matches, so there is no amplification. Event
# times are mapped into the dimension's era deterministically
# (event_id-keyed day offset) so every validity window gets probed.


def q_stream_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("custkey").orderBy("ts", "ord")
    changes = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.to_date("o_orderdate").alias("ts"),
            F.col("o_orderpriority").alias("attr"),
            F.col("o_orderkey").alias("ord"),
        )
        .withColumn("rn", F.row_number().over(Window.partitionBy("custkey", "ts").orderBy(F.col("ord").desc())))
        .where(F.col("rn") == 1)
        .drop("rn", "ord")
        .withColumn("prev", F.lag("attr").over(Window.partitionBy("custkey").orderBy("ts")))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("attr")))
        .withColumn(
            "valid_to",
            F.lead("ts").over(Window.partitionBy("custkey").orderBy("ts")),
        )
        .select("custkey", F.col("ts").alias("valid_from"), "valid_to", "attr")
    )
    s = events_stream(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("custkey"),
        # pinned effective date inside the dimension era
        F.date_add(F.lit("1995-01-01").cast("date"), (F.col("event_id") % 2400).cast("int")).alias("eff"),
    )
    joined = s.join(
        F.broadcast(changes),
        (s.custkey == changes.custkey)
        & (F.col("eff") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("eff") < F.col("valid_to"))),
    ).select(s.custkey.alias("ck"), "attr")
    agg = joined.groupBy("attr").agg(F.count(F.lit(1)).alias("n_events"))
    return run_to_table(agg, "complete").orderBy("attr")


Q_STREAM_SCD2_SQL = """
WITH dedup AS (
  SELECT custkey, ts, attr FROM (
    SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS ts,
           o_orderpriority AS attr,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
             ORDER BY o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1),
changes AS (
  SELECT custkey, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts) AS valid_to, attr
  FROM (
    SELECT *, LAG(attr) OVER (PARTITION BY custkey ORDER BY ts) AS prev
    FROM dedup)
  WHERE prev IS NULL OR prev <> attr),
probes AS (
  SELECT event_id, user_id AS custkey,
         CAST('1995-01-01' AS DATE) + INTERVAL (event_id % 2400) DAY AS eff
  FROM events)
SELECT c.attr, CAST(COUNT(*) AS BIGINT) AS n_events
FROM probes p JOIN changes c
  ON p.custkey = c.custkey
 AND p.eff >= c.valid_from
 AND (c.valid_to IS NULL OR p.eff < c.valid_to)
GROUP BY c.attr
ORDER BY c.attr
"""

QUERIES["q_stream_scd2_join"] = QuerySpec(
    q_stream_scd2_join,
    Q_STREAM_SCD2_SQL,
    "stream → SCD2 validity-window join: events resolve the dimension "
    "version current at their EFFECTIVE time (broadcast history, "
    "range probe, no amplification)",
)


# -------------------------- deterministic late-data accounting
# A custom 3-file staging holds back a pinned subset of OLD events
# (event_id % 37 == 0 among those ≥ 2h before the 70% time split) and
# delivers them TWO triggers later. Two, not one: Spark's late-input
# filter uses the PREVIOUS trigger's watermark (measured here —
# one-trigger-late rows merge into still-open state with
# numRowsDroppedByWatermark = 0), so only data arriving ≥ 2 triggers
# past its window actually drops. The oracle excludes exactly the
# displaced set AND the tail windows the final watermark never closes
# (append mode only emits closed windows) — both rules are
# deterministic functions of the staging.

_LATE_STAGED: dict[str, str] = {}


def _stage_late(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _LATE_STAGED:
        return _LATE_STAGED[sf_dir]
    import time as _time

    ensure_engine_confs(spark)
    d = tempfile.mkdtemp(prefix="kcore_late_chunks_")
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    split, split2 = ev.agg(
        F.expr("percentile(unix_micros(ts), 0.7)").alias("q"),
        F.expr("percentile(unix_micros(ts), 0.85)").alias("q2"),
    ).first()
    split, split2 = int(split), int(split2)
    two_h = 2 * 3600 * 1_000_000
    displaced = (F.unix_micros("ts") <= split - two_h) & (F.col("event_id") % 37 == 0)
    chunks = (
        ev.where((F.unix_micros("ts") <= split) & ~displaced),
        ev.where((F.unix_micros("ts") > split) & (F.unix_micros("ts") <= split2)),
        ev.where((F.unix_micros("ts") > split2) | displaced),
    )
    for i, part in enumerate(chunks):
        pdir = os.path.join(d, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        f = next(x for x in os.listdir(pdir) if x.endswith(".parquet"))
        dst = os.path.join(d, f"chunk_{i:02d}.parquet")
        os.rename(os.path.join(pdir, f), dst)
        ts = _time.time() - (3 - i) * 10
        os.utime(dst, (ts, ts))
    _LATE_STAGED[sf_dir] = d
    return d


def q_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage_late(spark, sf_dir)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = normalize_event_ts(
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_table(agg, "append")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"), "n"
    ).orderBy("window_start")


Q_STREAM_LATE_SQL = """
WITH split AS (
  SELECT CAST(quantile_cont(epoch_us(CAST(ts AS TIMESTAMP)), 0.7) AS BIGINT) AS q,
         MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS mx
  FROM events),
kept AS (
  SELECT ts FROM events CROSS JOIN split
  WHERE NOT (epoch_us(CAST(ts AS TIMESTAMP)) <= q - 7200000000
             AND event_id % 37 = 0)
    -- append mode never emits windows the final watermark (max ts −
    -- 30 min) has not closed: window end must be <= final watermark
    AND epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR)
        <= mx - 1800000000)
SELECT CAST(floor(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) AS BIGINT)
         AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n
FROM kept
GROUP BY 1
ORDER BY window_start
"""

QUERIES["q_stream_late_data_drop"] = QuerySpec(
    q_stream_late_data_drop,
    Q_STREAM_LATE_SQL,
    "deterministic late-data accounting: a staged out-of-order chunk "
    "forces the 30-min watermark to drop a pinned event subset; the "
    "oracle excludes exactly that set",
)

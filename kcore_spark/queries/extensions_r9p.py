"""Round-9 surface extensions, batch P (SURVEY §2.3 N r9): lakehouse
operations — a compaction planner (greedy size-binned grouping of a
file inventory: the small-files remedy q_file_provenance diagnoses),
the write-audit-publish gate (DQ counters computed over a staged
write BEFORE publish), and a freshness-SLA audit (per-source event
staleness against the high-water mark).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
The file inventory is derived deterministically from the fixture
(priority×week slices) so the oracle recomputes the same inventory —
the ALGORITHM (cumulative-sum bin assignment) is what's pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------ compaction planner (bin packing)
# Inventory: one "file" per (priority, week) with size = row count.
# Within each priority, files are packed into target-size compaction
# groups by the running-sum rule bin = floor(cum_before / target) —
# the deterministic first-fit-in-order packer (greedy FFD needs a
# sort by size; in-order keeps time locality, which is what
# compaction wants). Output: per (priority, bin): files, rows — the
# job list a compactor would execute. Scale: the inventory is
# |partitions|-sized, tiny by construction; the window runs per
# priority.

_COMPACT_TARGET = 2000  # rows per compacted output group


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    inv = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.weekofyear(F.to_date("o_orderdate")).alias("wk"),
        F.year(F.to_date("o_orderdate")).alias("yr"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    w = Window.partitionBy("prio").orderBy("yr", "wk")
    planned = inv.withColumn(
        "cum_before",
        F.coalesce(F.sum("sz").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    ).withColumn("bin", F.floor(F.col("cum_before") / F.lit(_COMPACT_TARGET)))
    return (
        planned.groupBy("prio", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("sz").cast("long").alias("n_rows"),
        )
        .orderBy("prio", "bin")
    )


Q_COMPACT_SQL = f"""
WITH inv AS (
  SELECT o_orderpriority AS prio,
         weekofyear(CAST(o_orderdate AS DATE)) AS wk,
         year(CAST(o_orderdate AS DATE)) AS yr,
         COUNT(*) AS sz
  FROM orders GROUP BY 1, 2, 3),
planned AS (
  SELECT prio, sz,
         FLOOR(COALESCE(SUM(sz) OVER (PARTITION BY prio ORDER BY yr, wk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_COMPACT_TARGET}) AS bin
  FROM inv)
SELECT prio, CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sz) AS BIGINT) AS n_rows
FROM planned
GROUP BY prio, bin
ORDER BY prio, bin
"""

QUERIES["q_compaction_plan"] = QuerySpec(
    q_compaction_plan,
    Q_COMPACT_SQL,
    "compaction planner: running-sum bin packing of a priority×week "
    "file inventory into target-size groups — the small-files remedy",
)


# ----------------------------- write-audit-publish (the WAP gate)
# The lakehouse promotion discipline: write to STAGING, compute the
# audit (row counts, null keys, dup keys, checksum), publish only if
# clean. The query returns the audit row a WAP gate would evaluate —
# with a real staged write so the audited object is the written
# artifact, not the source frame. Oracle recomputes the audit from
# the fixture (the write is lossless by contract — that IS the
# audit's point).

import os
import tempfile

_WAP_STAGED: dict[str, str] = {}


def q_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _WAP_STAGED:
        d = tempfile.mkdtemp(prefix="kcore_wap_")
        load_table(spark, sf_dir, "orders").where(
            F.col("o_orderstatus") == "F"
        ).write.mode("overwrite").parquet(os.path.join(d, "staging"))
        _WAP_STAGED[sf_dir] = d
    staged = spark.read.parquet(os.path.join(_WAP_STAGED[sf_dir], "staging"))
    audit = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("o_orderkey").isNull().cast("int")).cast("long").alias("null_keys"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).cast("long").alias("dup_keys"),
        F.sum(F.col("o_orderkey") % 997).cast("long").alias("key_checksum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("price_sum"),
    )
    return audit.withColumn(
        "publish_ok",
        ((F.col("null_keys") == 0) & (F.col("dup_keys") == 0) & (F.col("n_rows") > 0)).cast("int"),
    )


Q_WAP_SQL = """
WITH staged AS (SELECT * FROM orders WHERE o_orderstatus = 'F')
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
       CAST(SUM(o_orderkey % 997) AS BIGINT) AS key_checksum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
       CAST(CASE WHEN SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                  AND COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
                  AND COUNT(*) > 0 THEN 1 ELSE 0 END AS INT) AS publish_ok
FROM staged
"""

QUERIES["q_write_audit_publish"] = QuerySpec(
    q_write_audit_publish,
    Q_WAP_SQL,
    "write-audit-publish gate: DQ audit (nulls/dups/checksum) over a "
    "real staged parquet write, publish flag — the promotion discipline",
)


# ------------------------------------ freshness-SLA audit
# Per-source staleness: lag of each source's latest event behind the
# corpus high-water mark, with an SLA verdict per source — the data
# freshness monitor every ingestion pipeline runs. Uses documents'
# source column joined to events through the md5 assignment (the
# fixture has no native source-of-event; the assignment is pinned and
# identical in both engines, so the AUDIT machinery is what's
# verified).


def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "event_id", F.unix_timestamp("ts").alias("t")
    )
    src = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 4
    )
    tagged = ev.select(src.alias("feed"), "t")
    hwm = tagged.agg(F.max("t").alias("hwm"))
    per_feed = tagged.groupBy("feed").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"), F.max("t").alias("latest")
    )
    return (
        per_feed.crossJoin(F.broadcast(hwm))
        .select(
            "feed",
            "n_events",
            (F.col("hwm") - F.col("latest")).cast("long").alias("staleness_s"),
            ((F.col("hwm") - F.col("latest")) <= 3600).cast("int").alias("sla_ok"),
        )
        .orderBy("feed")
    )


Q_FRESHNESS_SQL = """
WITH tagged AS (
  SELECT ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS feed,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t
  FROM events),
hwm AS (SELECT MAX(t) AS hwm FROM tagged),
per_feed AS (
  SELECT feed, COUNT(*) AS n_events, MAX(t) AS latest FROM tagged GROUP BY feed)
SELECT feed, CAST(n_events AS BIGINT) AS n_events,
       CAST(hwm - latest AS BIGINT) AS staleness_s,
       CAST(CASE WHEN hwm - latest <= 3600 THEN 1 ELSE 0 END AS INT) AS sla_ok
FROM per_feed CROSS JOIN hwm
ORDER BY feed
"""

QUERIES["q_freshness_audit"] = QuerySpec(
    q_freshness_audit,
    Q_FRESHNESS_SQL,
    "freshness-SLA audit: per-feed staleness behind the high-water "
    "mark with an SLA verdict — the ingestion monitor",
)

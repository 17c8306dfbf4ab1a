"""Round-10 surface extensions, batch N (SURVEY §2.3 N r10): the
calendar-profile / dedup-audit block — ISO day-of-week revenue
profile with the weekend-lift readout, hour-of-day activity profile
(across all days) with the peak-to-trough ratio, and the
exact-duplicate family-size histogram with its dedup-savings ledger.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer counts/cents end-to-end; the only doubles are
final per-row shares/ratios. Day-of-week is pinned to ISO numbering
(Monday=1): Spark weekday()+1 == DuckDB isodow().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------------- ISO day-of-week revenue profile
# Revenue and order counts by ISO weekday, plus each day's index vs
# the uniform 1/7 — the staffing/capacity calendar. Integer cents.


def q_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per = orders.groupBy("iso_dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").alias("cents"),
    )
    tot = per.agg(F.sum("cents").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("iso_dow").cast("int").alias("iso_dow"),
            "n_orders",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") / F.col("total").cast("double") * 7, 6).alias(
                "dow_index"
            ),
        )
        .orderBy("iso_dow")
    )


Q_DOW_SQL = """
WITH per AS (
  SELECT isodow(o_orderdate) AS iso_dow, COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
tot AS (SELECT SUM(cents) AS total FROM per)
SELECT CAST(iso_dow AS INTEGER) AS iso_dow,
       CAST(n_orders AS BIGINT) AS n_orders,
       ROUND(cents / 100.0, 2) AS revenue,
       ROUND(cents * 1.0 / total * 7, 6) AS dow_index
FROM per, tot
ORDER BY iso_dow
"""

QUERIES["q_weekday_effect"] = QuerySpec(
    q_weekday_effect,
    Q_DOW_SQL,
    "ISO day-of-week revenue profile (index vs uniform 1/7, integer "
    "cents) — the capacity calendar",
)


# ----------------------------------- hour-of-day activity profile
# Event counts by hour-of-day ACROSS all days (the diurnal profile,
# not a time series), with share and the peak/trough hours in a
# 1-row summary companion column set. 24-row output.


def q_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    per = ev.groupBy(F.hour("ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    tot = per.agg(
        F.sum("n_events").alias("total"),
        F.max("n_events").alias("mx"),
        F.min("n_events").alias("mn"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("hour").cast("int").alias("hour"),
            "n_events",
            F.round(F.col("n_events") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
            F.round(F.col("mx") / F.col("mn").cast("double"), 6).alias(
                "peak_to_trough"
            ),
        )
        .orderBy("hour")
    )


Q_HOD_SQL = """
WITH per AS (
  SELECT EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY 1),
tot AS (SELECT SUM(n_events) AS total, MAX(n_events) AS mx,
               MIN(n_events) AS mn FROM per)
SELECT CAST(hour AS INTEGER) AS hour,
       CAST(n_events AS BIGINT) AS n_events,
       ROUND(n_events * 1.0 / total, 6) AS share,
       ROUND(mx * 1.0 / mn, 6) AS peak_to_trough
FROM per, tot
ORDER BY hour
"""

QUERIES["q_hour_of_day_profile"] = QuerySpec(
    q_hour_of_day_profile,
    Q_HOD_SQL,
    "hour-of-day diurnal activity profile (share per hour, "
    "peak-to-trough ratio) across all fixture days",
)


# --------------------- exact-duplicate family-size histogram
# md5(text) families over documents: how many families of size 1, 2,
# 3+..., and the dedup-savings ledger (rows/chars removable keeping
# one survivor per family). The size histogram is the audit view the
# exact-dedup operator family (q_dedup_exact etc.) doesn't surface.


def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.col("text")).alias("h"), "n_chars"
    )
    fam = docs.groupBy("h").agg(
        F.count(F.lit(1)).alias("sz"), F.sum("n_chars").alias("chars")
    )
    return (
        fam.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_families"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("long").alias("removable_docs"),
            # integer division (div //): double-cast truncation vs
            # rounding differs across engines
            F.sum(F.col("chars") - F.expr("chars div sz"))
            .cast("long")
            .alias("removable_chars_approx"),
        )
        .select(
            F.col("sz").cast("long").alias("family_size"),
            "n_families",
            "n_docs",
            "removable_docs",
            "removable_chars_approx",
        )
        .orderBy("family_size")
    )


Q_DUPFAM_SQL = """
WITH fam AS (
  SELECT md5(text) AS h, COUNT(*) AS sz, SUM(n_chars) AS chars
  FROM documents GROUP BY md5(text))
SELECT CAST(sz AS BIGINT) AS family_size,
       CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(SUM(sz - 1) AS BIGINT) AS removable_docs,
       CAST(SUM(chars - (chars // sz)) AS BIGINT)
         AS removable_chars_approx
FROM fam
GROUP BY sz
ORDER BY family_size
"""

QUERIES["q_dup_cluster_sizes"] = QuerySpec(
    q_dup_cluster_sizes,
    Q_DUPFAM_SQL,
    "exact-duplicate family-size histogram over md5(text) with the "
    "dedup-savings ledger — the dedup audit view",
)

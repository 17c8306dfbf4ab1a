"""Round-10 surface extensions, batch F (SURVEY §2.3 N r10): the
product-analytics block II — the L28 engagement histogram (the
power-user curve), RFM-lite segment migration between window halves,
repeat-purchase gap percentiles per market segment, and the daily
new-vs-returning split.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer day/count arithmetic end-to-end; gap percentiles
pair F.percentile with quantile_cont on integer day gaps; orderings
fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ---------------------------------- L28 engagement histogram
# Active days per user over the trailing 28 days (anchored at the
# fixture's max event date — deterministic, no wall clock), bucketed
# into the classic power-user-curve bands. Two keyed aggregations
# riding one scan; integer everywhere.


def q_l28_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", F.to_date("ts").alias("day")
    )
    anchor = ev.agg(F.max("day").alias("mx"))
    recent = ev.crossJoin(F.broadcast(anchor)).where(
        F.datediff(F.col("mx"), F.col("day")) < 28
    )
    per_user = recent.select("user_id", "day").distinct().groupBy("user_id").agg(
        F.count(F.lit(1)).alias("active_days")
    )
    band = (
        F.when(F.col("active_days") <= 3, "1_casual_1_3")
        .when(F.col("active_days") <= 10, "2_regular_4_10")
        .when(F.col("active_days") <= 20, "3_core_11_20")
        .otherwise("4_power_21_28")
    )
    total = per_user.count()
    return (
        per_user.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("active_days").cast("long").alias("total_active_days"),
        )
        .withColumn(
            "user_share", F.round(F.col("n_users") / F.lit(float(total)), 6)
        )
        .orderBy("band")
    )


Q_L28_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
anchor AS (SELECT MAX(day) AS mx FROM ev),
per_user AS (
  SELECT user_id, COUNT(DISTINCT day) AS active_days
  FROM ev, anchor WHERE date_diff('day', day, mx) < 28
  GROUP BY user_id),
banded AS (
  SELECT CASE WHEN active_days <= 3 THEN '1_casual_1_3'
              WHEN active_days <= 10 THEN '2_regular_4_10'
              WHEN active_days <= 20 THEN '3_core_11_20'
              ELSE '4_power_21_28' END AS band,
         active_days
  FROM per_user),
tot AS (SELECT COUNT(*) AS t FROM per_user)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(active_days) AS BIGINT) AS total_active_days,
       ROUND(COUNT(*) / CAST(ANY_VALUE(t) AS DOUBLE), 6) AS user_share
FROM banded, tot
GROUP BY band
ORDER BY band
"""

QUERIES["q_l28_engagement"] = QuerySpec(
    q_l28_engagement,
    Q_L28_SQL,
    "L28 engagement histogram (active days per user in the trailing "
    "28 days, power-user-curve bands)",
)


# ------------------------------------ RFM-lite segment migration
# Split the order window at its midpoint date; segment each customer
# per half by order frequency (0 / 1-2 / 3+), and count the 3x3
# migration matrix — the retention-marketing staple. Integer counts;
# the midpoint is derived from min/max order dates (deterministic).


def q_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("d")
    )
    bounds = orders.agg(
        F.min("d").alias("lo"),
        F.date_add(
            F.min("d"), F.floor(F.datediff(F.max("d"), F.min("d")) / 2).cast("int")
        ).alias("mid"),
    )
    j = orders.crossJoin(F.broadcast(bounds))
    per = j.groupBy("o_custkey").agg(
        F.sum((F.col("d") <= F.col("mid")).cast("int")).alias("n1"),
        F.sum((F.col("d") > F.col("mid")).cast("int")).alias("n2"),
    )
    seg = lambda c: (
        F.when(F.col(c) == 0, "0_none")
        .when(F.col(c) <= 2, "1_low")
        .otherwise("2_high")
    )
    return (
        per.groupBy(
            seg("n1").alias("seg_h1"), seg("n2").alias("seg_h2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("seg_h1", "seg_h2")
    )


Q_RFM_MIG_SQL = """
WITH bounds AS (
  SELECT MIN(o_orderdate) AS lo,
         MIN(o_orderdate)
           + CAST(FLOOR(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) / 2)
                  AS INTEGER) * INTERVAL 1 DAY AS mid
  FROM orders),
per AS (
  SELECT o_custkey,
         SUM(CASE WHEN o_orderdate <= mid THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN o_orderdate > mid THEN 1 ELSE 0 END) AS n2
  FROM orders, bounds GROUP BY o_custkey)
SELECT CASE WHEN n1 = 0 THEN '0_none' WHEN n1 <= 2 THEN '1_low'
            ELSE '2_high' END AS seg_h1,
       CASE WHEN n2 = 0 THEN '0_none' WHEN n2 <= 2 THEN '1_low'
            ELSE '2_high' END AS seg_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM per
GROUP BY seg_h1, seg_h2
ORDER BY seg_h1, seg_h2
"""

QUERIES["q_rfm_migration"] = QuerySpec(
    q_rfm_migration,
    Q_RFM_MIG_SQL,
    "RFM-lite frequency-segment migration matrix between window "
    "halves — the retention-marketing transition table",
)


# --------------------------- repeat-purchase gap percentiles
# Per customer, the day gaps between consecutive orders (keyed lag
# window, 1 partition per customer), then exact gap percentiles per
# market segment. Integer day gaps; F.percentile <-> quantile_cont.


def q_repeat_purchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").alias("d")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.withColumn("prev", F.lag("d").over(w))
        .where(F.col("prev").isNotNull())
        .select("o_custkey", F.datediff(F.col("d"), F.col("prev")).alias("gap"))
    )
    return (
        gaps.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.round(F.percentile("gap", 0.25), 4).alias("p25_gap"),
            F.round(F.percentile("gap", 0.5), 4).alias("median_gap"),
            F.round(F.percentile("gap", 0.75), 4).alias("p75_gap"),
        )
        .orderBy("c_mktsegment")
    )


Q_GAP_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders),
g AS (SELECT o_custkey, gap FROM gaps WHERE gap IS NOT NULL)
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(g.gap, 0.25), 4) AS p25_gap,
       ROUND(quantile_cont(g.gap, 0.5), 4) AS median_gap,
       ROUND(quantile_cont(g.gap, 0.75), 4) AS p75_gap
FROM g JOIN customer c ON c.c_custkey = g.o_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

QUERIES["q_repeat_purchase_gap"] = QuerySpec(
    q_repeat_purchase_gap,
    Q_GAP_SQL,
    "repeat-purchase day-gap percentiles per market segment (keyed "
    "lag + exact percentiles) — purchase-cadence profile",
)


# ------------------------------------ daily new vs returning users
# First-seen date per user (one keyed min), then each (user, day)
# activity row splits into new/returning — the acquisition-vs-
# retention daily ledger. Output: the last 10 days (deterministic
# tail of the fixture calendar).


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        ev.join(F.broadcast(first), "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("long")
            .alias("n_new"),
            F.sum((F.col("day") > F.col("first_day")).cast("int"))
            .cast("long")
            .alias("n_returning"),
        )
    )
    return (
        daily.orderBy(F.col("day").desc())
        .limit(10)
        .select(
            F.col("day").cast("string").alias("day"),
            "n_new",
            "n_returning",
            F.round(
                F.col("n_returning") / (F.col("n_new") + F.col("n_returning")), 6
            ).alias("returning_share"),
        )
        .orderBy("day")
    )


Q_NEWRET_SQL = """
WITH ev AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (
  SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY user_id),
daily AS (
  SELECT day,
         SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS n_returning
  FROM ev JOIN first USING (user_id)
  GROUP BY day),
tail10 AS (SELECT * FROM daily ORDER BY day DESC LIMIT 10)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_returning AS BIGINT) AS n_returning,
       ROUND(n_returning * 1.0 / (n_new + n_returning), 6) AS returning_share
FROM tail10
ORDER BY day
"""

QUERIES["q_new_vs_returning"] = QuerySpec(
    q_new_vs_returning,
    Q_NEWRET_SQL,
    "daily new vs returning active users (first-seen split), last 10 "
    "fixture days — the acquisition/retention ledger",
)

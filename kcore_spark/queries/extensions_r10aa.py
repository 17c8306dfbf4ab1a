"""Round-10 surface extensions, batch AA (SURVEY §2.3 N r10): the
reconciliation/lifecycle block — the header-vs-detail totals
reconciliation report (orders.o_totalprice against the lineitem
rollup, banded by relative discrepancy — the cross-table DQ staple;
the synthetic fixture deliberately does NOT reconcile, which is
exactly what the report surfaces), the join-fanout histogram
(lineitems per order / orders per customer — the CBO's favorite
statistic), and the dormancy-reactivation rate (users returning
after a 14+ day gap).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer cents/counts end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------- header-vs-detail totals reconciliation bands
# |header - detail| / header, banded. Orders with no line items get
# their own band (the referential half of the check). Integer cents;
# band cuts are integer cross-multiplications (no float compare).


def q_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "detail_cents"
            )
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("header_cents"),
    )
    j = orders.join(li, "o_orderkey", "left")
    diff = F.abs(F.col("header_cents") - F.col("detail_cents"))
    band = (
        F.when(F.col("detail_cents").isNull(), "0_no_lineitems")
        .when(diff * 100 <= F.col("header_cents"), "1_within_1pct")
        .when(diff * 10 <= F.col("header_cents"), "2_within_10pct")
        .when(diff * 2 <= F.col("header_cents"), "3_within_50pct")
        .otherwise("4_over_50pct")
    )
    return (
        j.groupBy(band.alias("discrepancy_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("header_cents") / 100.0, 2).alias("header_revenue"),
        )
        .orderBy("discrepancy_band")
    )


Q_RECON_SQL = """
WITH li AS (
  SELECT l_orderkey AS o_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS detail_cents
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS header_cents,
         li.detail_cents
  FROM orders o LEFT JOIN li USING (o_orderkey)),
banded AS (
  SELECT header_cents,
         CASE WHEN detail_cents IS NULL THEN '0_no_lineitems'
              WHEN ABS(header_cents - detail_cents) * 100 <= header_cents
                THEN '1_within_1pct'
              WHEN ABS(header_cents - detail_cents) * 10 <= header_cents
                THEN '2_within_10pct'
              WHEN ABS(header_cents - detail_cents) * 2 <= header_cents
                THEN '3_within_50pct'
              ELSE '4_over_50pct' END AS discrepancy_band
  FROM j)
SELECT discrepancy_band, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(header_cents) / 100.0, 2) AS header_revenue
FROM banded
GROUP BY discrepancy_band
ORDER BY discrepancy_band
"""

QUERIES["q_order_total_reconciliation"] = QuerySpec(
    q_order_total_reconciliation,
    Q_RECON_SQL,
    "header-vs-detail totals reconciliation bands (orders vs lineitem "
    "rollup, integer-cents cross-multiplied cuts) — cross-table DQ",
)


# ------------------------------------------ join-fanout histogram
# Distribution of lineitems per order and orders per customer — the
# two fan-outs every cost-based join estimate needs. One output
# table keyed by (relation, fanout).


def q_fanout_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("lineitems_per_order").alias("relation"), "k", "n")
    )
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("orders_per_customer").alias("relation"), "k", "n")
    )
    return (
        li.unionByName(oc)
        .select(
            "relation",
            F.col("k").cast("long").alias("fanout"),
            F.col("n").cast("long").alias("n_keys"),
        )
        .orderBy("relation", "fanout")
    )


Q_FANOUT_SQL = """
WITH lo AS (
  SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY l_orderkey),
oc AS (
  SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY o_custkey)
SELECT 'lineitems_per_order' AS relation,
       CAST(k AS BIGINT) AS fanout, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM lo GROUP BY k
UNION ALL
SELECT 'orders_per_customer', CAST(k AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM oc GROUP BY k
ORDER BY relation, fanout
"""

QUERIES["q_fanout_histogram"] = QuerySpec(
    q_fanout_histogram,
    Q_FANOUT_SQL,
    "join-fanout histograms (lineitems/order, orders/customer) — the "
    "CBO multiplicity profile",
)


# ---------------------------------- dormancy-reactivation rate
# A reactivation = a user event following a 14+ day personal gap;
# weekly counts of reactivations vs active users — the win-back
# readout. Keyed lag; week keyed by Monday date.

_DORMANT_DAYS = 14


def q_reactivation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    d = ev.withColumn("prev", F.lag("day").over(w))
    flagged = d.select(
        "user_id",
        "day",
        (
            F.col("prev").isNotNull()
            & (F.datediff(F.col("day"), F.col("prev")) >= _DORMANT_DAYS)
        ).cast("int").alias("reactivated"),
    )
    weekly = flagged.groupBy(
        F.date_trunc("week", F.col("day")).cast("date").alias("week")
    ).agg(
        F.countDistinct("user_id").cast("long").alias("n_active_users"),
        F.sum("reactivated").cast("long").alias("n_reactivations"),
    )
    return (
        weekly.select(
            F.col("week").cast("string").alias("week"),
            "n_active_users",
            "n_reactivations",
            F.round(
                F.col("n_reactivations") / F.col("n_active_users").cast("double"),
                6,
            ).alias("reactivation_rate"),
        )
        .orderBy("week")
    )


Q_REACT_SQL = f"""
WITH ev AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
d AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
  FROM ev),
flagged AS (
  SELECT user_id, day,
         CASE WHEN prev IS NOT NULL
                   AND date_diff('day', prev, day) >= {_DORMANT_DAYS}
              THEN 1 ELSE 0 END AS reactivated
  FROM d)
SELECT CAST(CAST(date_trunc('week', day) AS DATE) AS VARCHAR) AS week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
       CAST(SUM(reactivated) AS BIGINT) AS n_reactivations,
       ROUND(SUM(reactivated) / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 6)
         AS reactivation_rate
FROM flagged
GROUP BY date_trunc('week', day)
ORDER BY week
"""

QUERIES["q_reactivation_rate"] = QuerySpec(
    q_reactivation_rate,
    Q_REACT_SQL,
    "weekly dormancy-reactivation rate (events after a 14+ day "
    "personal gap, keyed lag) — the win-back readout",
)

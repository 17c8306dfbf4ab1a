"""Batch relational core (SURVEY §2.3 A-D, F): scan/filter/join/agg.

TPC-H-shaped queries adapted to the fixture schema. Plan notes for the
100 TB case are on each query: which side broadcasts, where the one
shuffle lands, what pushes down to the parquet scan.

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
from kcore_spark.operators.relational import (
    davg,
    dsum,
    money,
    qty,
    rate,
    spread_if_serial,
)
from kcore_spark.queries import QuerySpec

# ---------------------------------------------------------------- q01
# Pricing summary. Scan+filter pushes l_shipdate to parquet row-group
# stats; one partial+final hash aggregate over 6 groups — no other
# shuffle. Scales linearly: the only exchange carries ~6 rows/task.


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_if_serial (r14, was unconditional spread in r13): the
    # fixtures' single-row-group scan otherwise runs the whole
    # BigDecimal partial aggregate in one task (A/B min-of-5 at sf0.1:
    # 1.31s -> 0.81s) — but the 4-group rollup is NOT keyed by
    # l_orderkey, so on an already-parallel scan layout the exchange
    # would shuffle the whole fact table for nothing; the layout probe
    # keeps it fixture-only (operators/relational.py::spread_if_serial)
    base = load_table(spark, sf_dir, "lineitem")
    li = spread_if_serial(
        base.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")),
        "l_orderkey",
        probe=base,
        cache_key=f"{sf_dir}/lineitem",
    )
    disc_price = money("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - rate("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + rate("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty("l_quantity"), "sum_qty"),
            dsum(money("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(qty("l_quantity"), "avg_qty"),
            davg(money("l_extendedprice"), "avg_price"),
            davg(rate("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
           / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
           / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
           / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------- q03
# Shipping priority. customer is the small side → broadcast; the
# orders⋈lineitem equi-join shuffles on the orderkey only. Top-10 is
# TakeOrderedAndProject (per-partition heap, no global sort).


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.lit("1998-06-01").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < d)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > d)
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q03_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# ---------------------------------------------------------------- q05
# Local-supplier revenue: 6-way join. nation/region/supplier broadcast
# (dims); lineitem⋈orders is the only large shuffle. The extra
# c_nationkey = s_nationkey predicate is applied post-join.


def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q05_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

# ---------------------------------------------------------------- q10
# Returned-item revenue by customer (top 20).


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# ------------------------------------------------- broadcast dim agg
# part is a dimension: explicit broadcast() keeps the lineitem side
# shuffle-free — the aggregate shuffles only the per-brand partials.


def q_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_if_serial (r14): broadcast join + decimal partial agg
    # otherwise ride the serial single-row-group scan task; the
    # per-brand agg is not keyed by l_partkey, so the exchange is
    # layout-gated — an already-parallel scan keeps its partitioning
    li = spread_if_serial(
        load_table(spark, sf_dir, "lineitem"),
        "l_partkey",
        cache_key=f"{sf_dir}/lineitem",
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(qty("l_quantity"), "sum_qty"),
            davg(money("l_extendedprice"), "avg_price"),
        )
        .orderBy("p_brand")
    )


Q_BRAND_SQL = """
SELECT p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
           / COUNT(l_extendedprice) AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

# ------------------------------------------------------ semi / anti
# left_semi/left_anti avoid materializing the probe side — at scale
# these broadcast the filtered orders keyset when small enough, else
# shuffle only the keys.


def q_semi_join_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    o97 = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        cust.join(o97, cust.c_custkey == o97.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01')
"""


def q_anti_join_never_bought(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    o95 = load_table(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    return (
        cust.join(o95, cust.c_custkey == o95.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
"""

# ------------------------------------------------------- q13 custdist
# Outer join + two-level aggregate; all-integer so exactly portable.


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# ---------------------------------------------------- global top-k
# Catalyst rewrites orderBy+limit into TakeOrderedAndProject: each
# task keeps a 25-row heap; the driver merges — no global sort at any
# scale.


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


Q_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""

# ---------------------------------------------------- filter predicates


def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_linestatus").isNotNull()
            & ((F.col("l_discount") < 0.05) | (F.col("l_tax") > 0.04))
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum(money("l_extendedprice"), "sum_price"))
        .orderBy("l_returnflag")
    )


Q_FILTER_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A','R')
  AND l_linestatus IS NOT NULL
  AND (l_discount < 0.05 OR l_tax > 0.04)
GROUP BY l_returnflag
"""


QUERIES = {
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, Q01_SQL, "TPC-H Q1 scan+filter+agg"),
    "q03_shipping_priority": QuerySpec(q03_shipping_priority, Q03_SQL, "3-way join, top-10"),
    "q05_local_supplier_volume": QuerySpec(q05_local_supplier_volume, Q05_SQL, "6-way join"),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL, "join+agg top-20"),
    "q_brand_volume": QuerySpec(q_brand_volume, Q_BRAND_SQL, "broadcast dim join"),
    "q_semi_join_buyers": QuerySpec(q_semi_join_buyers, Q_SEMI_SQL, "left semi join"),
    "q_anti_join_never_bought": QuerySpec(q_anti_join_never_bought, Q_ANTI_SQL, "left anti join"),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, Q13_SQL, "outer join agg"),
    "q_topk_orders": QuerySpec(q_topk_orders, Q_TOPK_SQL, "global top-k"),
    "q_filter_predicates": QuerySpec(q_filter_predicates, Q_FILTER_SQL, "predicate surface"),
}

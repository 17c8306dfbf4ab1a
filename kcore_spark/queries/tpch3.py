"""TPC-H Q2/Q11/Q20/Q21 adaptations (SURVEY §2.3 C/D) — completing the
22-query shape coverage.

The fixture schema has no ``partsupp``, ``l_commitdate`` or
``l_receiptdate``, so each query keeps its structural point —
correlated-min supplier selection (Q2), scalar-subquery fraction
threshold (Q11), correlated share threshold + semi-join (Q20),
EXISTS / NOT-EXISTS exactly-one-offender (Q21) — re-derived from
``lineitem`` as the part↔supplier relationship and shipdate-vs-
orderdate lateness, mirroring the existing Q16/Q17/Q22 adaptations.

Determinism: every LIMIT is totally ordered by a unique key suffix;
all money sums are decimal-exact surfaced as double (FIXTURES.md).

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.caching import transient_persist
from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import money, qty, rate
from kcore_spark.queries import QuerySpec

# ---------------------------------------------------- q02: correlated min

_UNIT_PRICE = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)"
    " / CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)"
)


def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each SMALL-type part under size 20, the EUROPE supplier(s)
    selling it at the part's minimum observed unit price (Q2's
    correlated-min shape; lineitem plays partsupp, avg unit price
    plays ps_supplycost).

    Plan: one aggregation over lineitem builds the offer table; part
    (filtered, small) broadcasts into it; the correlated min is a
    window over the part key — no second scan, no decorrelation join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") < 20)
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    offers = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        (
            F.sum(money("l_extendedprice")).cast("double")
            / F.sum(qty("l_quantity")).cast("double")
        ).alias("unit_price")
    )
    euro_sup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
    )
    j = (
        offers.join(F.broadcast(part), F.col("partkey") == part.p_partkey)
        .join(F.broadcast(euro_sup), F.col("suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("partkey")
    return (
        j.withColumn("min_price", F.min("unit_price").over(w))
        .where(F.col("unit_price") == F.col("min_price"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("partkey").alias("p_partkey"),
            "p_name",
            F.col("s_suppkey").alias("suppkey"),
            F.round("unit_price", 6).alias("unit_price"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "suppkey"
        )
        .limit(100)
    )


Q02_SQL = f"""
WITH offers AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey, {_UNIT_PRICE} AS unit_price
  FROM lineitem GROUP BY 1, 2)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, suppkey,
       ROUND(unit_price, 6) AS unit_price
FROM offers
JOIN part ON partkey = p_partkey AND p_type = 'SMALL' AND p_size < 20
JOIN supplier ON suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE unit_price = (
  SELECT MIN(o2.unit_price) FROM offers o2
  JOIN supplier s2 ON o2.suppkey = s2.s_suppkey
  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
  WHERE o2.partkey = offers.partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, suppkey
LIMIT 100
"""

# ---------------------------------------------------- q11: fraction of total

_VALUE = "SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))"


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose discounted revenue through NATION_7 suppliers
    exceeds 0.1% of that nation's total (Q11's scalar-subquery
    fraction-threshold shape).

    Plan: ONE aggregation feeds both sides — the per-part values and
    the grand total (a second aggregate over the first, 2000 rows, not
    a rescan of lineitem); the threshold broadcasts as a 1-row cross
    join, Catalyst's standard scalar-subquery decorrelation."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nation_sup = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey, "left_semi")
    val = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    per_part = transient_persist(  # feeds both the threshold aggregate and the filter
        li.join(F.broadcast(nation_sup), li.l_suppkey == nation_sup.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(val).alias("value_dec"))
    )
    total = per_part.agg((F.sum("value_dec").cast("double") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("p_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS p_partkey, {_VALUE} AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7')
  GROUP BY 1)
SELECT p_partkey, CAST(value_dec AS DOUBLE) AS value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) > (
  SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM per_part)
ORDER BY value DESC, p_partkey
"""

# ---------------------------------------------------- q20: share threshold

def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EUROPE suppliers who shipped more than 30% of some 'small'
    part's total 1996 volume (Q20's correlated-threshold + semi-join
    shape: lineitem aggregates play partsupp availability).

    Plan: one aggregation at (part, supplier) grain; the per-part
    total is a window over it (no rescan); the qualifying supplier
    set semi-joins into supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    sp = (
        li.where(F.year("l_shipdate") == 1996)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(qty("l_quantity")).alias("sup_qty"))
    )
    w = Window.partitionBy("partkey")
    dominant = (
        sp.withColumn("part_qty", F.sum("sup_qty").over(w))
        .where(F.col("sup_qty").cast("double") > F.col("part_qty").cast("double") * 0.3)
        .select("suppkey")
        .distinct()
    )
    return (
        sup.join(dominant, sup.s_suppkey == dominant.suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH sp AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS sup_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1996
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2),
dominant AS (
  SELECT DISTINCT suppkey FROM sp s1
  WHERE CAST(sup_qty AS DOUBLE) > 0.3 * (
    SELECT CAST(SUM(s2.sup_qty) AS DOUBLE) FROM sp s2 WHERE s2.partkey = s1.partkey))
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT suppkey FROM dominant)
ORDER BY s_suppkey
"""

# ---------------------------------------------------- q21: sole late supplier

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late supplier on finalized
    multi-supplier orders (Q21's EXISTS + NOT-EXISTS shape; late =
    shipped >60 days after order date, the q04 lateness adaptation).

    Plan: the EXISTS pair decorrelates into one per-order aggregate
    (distinct suppliers, distinct late suppliers) joined back to the
    distinct late (order, supplier) pairs — lineitem is scanned once,
    versus the literal four-scan EXISTS formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    sup = load_table(spark, sf_dir, "supplier")

    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn("is_late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
    per_order = lo.groupBy("o_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    late_pairs = (
        lo.where(F.col("is_late")).select("o_orderkey", "l_suppkey").distinct()
    )
    waiting = late_pairs.join(
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
        "o_orderkey",
        "left_semi",
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(F.col("s_suppkey"), "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(100)
    )


Q21_SQL = """
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  JOIN orders ON o_orderkey = l1.l_orderkey
  WHERE o_orderstatus = 'F'
    AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
    AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
) late
JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 100
"""


QUERIES = {
    "q02_min_cost_supplier": QuerySpec(
        q02_min_cost_supplier, Q02_SQL, "correlated-min supplier selection (Q2 shape)"
    ),
    "q11_important_stock": QuerySpec(
        q11_important_stock, Q11_SQL, "scalar-subquery fraction threshold (Q11 shape)"
    ),
    "q20_dominant_suppliers": QuerySpec(
        q20_dominant_suppliers, Q20_SQL, "correlated share threshold + semi (Q20 shape)"
    ),
    "q21_waiting_suppliers": QuerySpec(
        q21_waiting_suppliers, Q21_SQL, "EXISTS/NOT-EXISTS sole offender (Q21 shape)"
    ),
}

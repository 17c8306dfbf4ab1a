"""Second TPC-H-shaped batch (Q7/Q8/Q12/Q14/Q16/Q19 adaptations):
two-sided dimension conditions, conditional-aggregate market share,
NOT IN subqueries, disjunctive multi-predicate pushdown.

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
from kcore_spark.operators.relational import money, rate
from kcore_spark.queries import QuerySpec

_REV = "CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"


def _disc_price():
    return money("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - rate("l_discount"))


# ---------------------------------------------------- q07 nation volume
# Trade flows between two specific nations, by direction and year.


def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("nk2"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q07_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""

# ---------------------------------------------------- q08 market share
# Conditional aggregate: one nation's share of total revenue per year.


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    )
    vol = _disc_price()
    target = F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(21,4)"))
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(vol).cast("double")).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q08_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
         / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share,
       CAST(SUM({_REV}) AS DOUBLE) AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY year(o_orderdate)
"""

# ---------------------------------------------------- q12 priority classes


def q12_priority_by_shipyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT year(l_shipdate) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY year(l_shipdate)
"""

# ---------------------------------------------------- q14 promo share


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(21,4)"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double")).alias(
            "promo_revenue_pct"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                             ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""

# ---------------------------------------------------- q16 NOT IN


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"))
    )


Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""

# ---------------------------------------------------- q19 disjunctive


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") <= 0.03))
    )
    return j.where(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'PROMO' AND l_discount <= 0.03)
"""


QUERIES = {
    "q07_nation_volume": QuerySpec(q07_nation_volume, Q07_SQL, "two-nation trade flows"),
    "q08_market_share": QuerySpec(q08_market_share, Q08_SQL, "conditional-agg market share"),
    "q12_priority_by_shipyear": QuerySpec(q12_priority_by_shipyear, Q12_SQL, "CASE aggregation"),
    "q14_promo_revenue_share": QuerySpec(q14_promo_revenue_share, Q14_SQL, "promo revenue %"),
    "q16_supplier_counts": QuerySpec(q16_supplier_counts, Q16_SQL, "NOT IN + count distinct"),
    "q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_SQL, "disjunctive predicates"),
}


# ---------------------------------------------------- q06 forecast revenue
# The classic: one scan, three pushable predicates, one global sum.


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


Q06_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------- q15 top supplier
# Revenue per supplier over a quarter; keep every supplier at the max
# (the spec's correlated-max view, done with a rank-free max join).


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where((F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-04-01"))
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("r"))
    )
    mx = rev.agg(F.max("r").alias("mr"))
    return (
        rev.join(F.broadcast(mx), rev.r == mx.mr)
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------- q09 profit by nation
# Q9 adaptation: the fixture has no partsupp, so "profit" is the
# discounted revenue credited to the supplier's nation per order year
# (same join graph minus the supplycost term).


def q09_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q09_SQL = f"""
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV}) AS DOUBLE) AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


QUERIES["q06_forecast_revenue"] = QuerySpec(q06_forecast_revenue, Q06_SQL, "TPC-H Q6")
QUERIES["q15_top_supplier"] = QuerySpec(q15_top_supplier, Q15_SQL, "TPC-H Q15 (max-join view)")
QUERIES["q09_profit_by_nation_year"] = QuerySpec(
    q09_profit_by_nation_year, Q09_SQL, "TPC-H Q9 adaptation (no partsupp in fixture)"
)

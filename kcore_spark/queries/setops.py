"""Set operations (SURVEY §2.3 G): union / intersect / except / distinct.
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
from kcore_spark.queries import QuerySpec


def _buyers(spark, sf_dir, year: int) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        cust.unionByName(supp).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy("nationkey")
    )


Q_UNION_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier)
GROUP BY nationkey
"""


def q_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir, 1996).intersect(_buyers(spark, sf_dir, 1997)).orderBy("custkey")


Q_INTERSECT_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def q_except_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir, 1996).exceptAll(_buyers(spark, sf_dir, 1997)).orderBy("custkey")


Q_EXCEPT_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def q_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


Q_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll/exceptAll multiset semantics on a low-cardinality col."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(F.col("l_quantity").alias("q"))
    b = li.where(F.col("l_returnflag") == "R").select(F.col("l_quantity").alias("q"))
    return a.intersectAll(b).groupBy("q").agg(F.count(F.lit(1)).alias("n")).orderBy("q")


Q_INTERSECT_ALL_SQL = """
SELECT q, COUNT(*) AS n FROM (
  SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'A'
  INTERSECT ALL
  SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R')
GROUP BY q
"""


QUERIES = {
    "q_union_all_counts": QuerySpec(q_union_all_counts, Q_UNION_SQL, "union all + agg"),
    "q_intersect_buyers": QuerySpec(q_intersect_buyers, Q_INTERSECT_SQL, "intersect"),
    "q_except_buyers": QuerySpec(q_except_buyers, Q_EXCEPT_SQL, "except"),
    "q_distinct_flags": QuerySpec(q_distinct_flags, Q_DISTINCT_SQL, "distinct"),
    "q_intersect_all_quantities": QuerySpec(
        q_intersect_all_quantities, Q_INTERSECT_ALL_SQL, "intersect all (multiset)"
    ),
}

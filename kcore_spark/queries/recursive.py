"""Recursive CTE surface (Spark 4.x WITH RECURSIVE — SQL entry point).

Walks each customer's order chain (orders linked in orderdate order)
recursively from the first order, producing depth histograms. The
same SQL text runs on both engines (modulo nothing — both speak
standard recursive CTEs), making this the cleanest possible oracle.

Scale note: recursive CTE execution in Spark is iterative union —
each step is a join against the previous frontier. Depth is bounded
by max orders per customer (~10 at these SFs); the frontier shrinks
monotonically. For deep graphs the iterative DataFrame loop with
checkpointing is the fallback; for this workload the CTE is exact.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kcore_spark.catalog import register_all
from kcore_spark.queries import QuerySpec

_CHAIN_SQL = """
WITH RECURSIVE edges AS (
  SELECT o_custkey, o_orderkey,
         LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_okey
  FROM orders
),
firsts AS (
  SELECT o_custkey, o_orderkey
  FROM (SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
  WHERE rn = 1
),
chain AS (
  SELECT o_custkey, o_orderkey, 1 AS depth FROM firsts
  UNION ALL
  SELECT e.o_custkey, e.next_okey, c.depth + 1
  FROM chain c
  JOIN edges e ON e.o_custkey = c.o_custkey AND e.o_orderkey = c.o_orderkey
  WHERE e.next_okey IS NOT NULL
)
SELECT depth, COUNT(*) AS n_customers_at_depth
FROM chain
GROUP BY depth
"""


def q_recursive_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql(_CHAIN_SQL)


QUERIES = {
    "q_recursive_order_chains": QuerySpec(
        q_recursive_order_chains, _CHAIN_SQL, "WITH RECURSIVE chain walk"
    ),
}

"""Round-9 surface extensions, batch X (SURVEY §2.3 N r9): the
NOT-IN-with-NULL semantics pin — the classic three-valued-logic trap
where `NOT IN` against a list containing NULL returns ZERO rows while
`NOT EXISTS` and the anti-join return the intuitive answer. Both
engines implement the ANSI rule; the query pins all three counts side
by side so a future optimizer rewrite that silently conflates them
breaks the hash.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_null_semantics_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    buyers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    # the poisoned list: every buyer key PLUS one NULL
    poisoned = buyers.unionByName(
        spark.range(1).select(F.lit(None).cast("long").alias("k"))
    )
    cust.createOrReplaceTempView("cust_ns_v")
    poisoned.createOrReplaceTempView("poisoned_ns_v")
    buyers.createOrReplaceTempView("buyers_ns_v")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM cust_ns_v
           WHERE c_custkey NOT IN (SELECT k FROM poisoned_ns_v)) AS not_in_poisoned,
          (SELECT COUNT(*) FROM cust_ns_v c
           WHERE NOT EXISTS (SELECT 1 FROM poisoned_ns_v p
                             WHERE p.k = c.c_custkey)) AS not_exists_poisoned,
          (SELECT COUNT(*) FROM cust_ns_v
           WHERE c_custkey NOT IN (SELECT k FROM buyers_ns_v)) AS not_in_clean
        """
    ).select(
        F.col("not_in_poisoned").cast("long").alias("not_in_poisoned"),
        F.col("not_exists_poisoned").cast("long").alias("not_exists_poisoned"),
        F.col("not_in_clean").cast("long").alias("not_in_clean"),
    )


Q_NULL_SEMANTICS_SQL = """
WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
poisoned AS (SELECT k FROM buyers UNION ALL SELECT NULL)
SELECT
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM poisoned)) AS BIGINT)
    AS not_in_poisoned,
  CAST((SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM poisoned p
                          WHERE p.k = c.c_custkey)) AS BIGINT)
    AS not_exists_poisoned,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM buyers)) AS BIGINT)
    AS not_in_clean
"""

QUERIES["q_null_semantics_antijoin"] = QuerySpec(
    q_null_semantics_antijoin,
    Q_NULL_SEMANTICS_SQL,
    "NOT IN vs NOT EXISTS under a NULL-poisoned list: the three-"
    "valued-logic pin (NOT IN → 0 rows, NOT EXISTS → true anti count)",
)

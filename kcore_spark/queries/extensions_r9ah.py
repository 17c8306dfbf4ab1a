"""Round-9 surface extensions, batch AH (SURVEY §2.3 N r9): cohort
LTV — cumulative spend per acquisition cohort at fixed ages (the
REVENUE side of cohort analysis; q_cohort_retention is the activity
side). Cohort = first-order quarter; ages 0/1/2 quarters; decimal-
exact spend sums.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("d").alias("first_d"))
    j = orders.join(first, "o_custkey").select(
        "o_custkey",
        F.date_trunc("quarter", F.col("first_d")).alias("cohort_q"),
        (
            (F.year("d") * 4 + F.quarter("d"))
            - (F.year("first_d") * 4 + F.quarter("first_d"))
        ).alias("age_q"),
        "v",
    )
    spend = (
        j.where(F.col("age_q") <= 2)
        .groupBy("cohort_q", "age_q")
        .agg(F.sum("v").cast("decimal(38,2)").alias("spend"))
    )
    cust = j.groupBy("cohort_q").agg(F.count_distinct("o_custkey").alias("n_cust"))
    return (
        spend.join(cust, "cohort_q")
        .select(
            F.date_format("cohort_q", "yyyy-MM").alias("cohort"),
            F.col("age_q").cast("int").alias("age_quarters"),
            F.col("n_cust").cast("long").alias("cohort_size"),
            F.round(F.col("spend").cast("double") / F.col("n_cust"), 2).alias(
                "spend_per_customer"
            ),
        )
        .orderBy("cohort", "age_quarters")
    )


Q_COHORT_LTV_SQL = """
WITH first AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d
  FROM orders GROUP BY o_custkey),
j AS (
  SELECT o.o_custkey,
         date_trunc('quarter', f.first_d) AS cohort_q,
         (year(o.o_orderdate) * 4 + quarter(o.o_orderdate))
           - (year(f.first_d) * 4 + quarter(f.first_d)) AS age_q,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey),
spend AS (
  SELECT cohort_q, age_q, CAST(SUM(v) AS DECIMAL(38,2)) AS spend
  FROM j WHERE age_q <= 2 GROUP BY cohort_q, age_q),
cust AS (
  SELECT cohort_q, COUNT(DISTINCT o_custkey) AS n_cust FROM j GROUP BY cohort_q)
SELECT strftime(s.cohort_q, '%Y-%m') AS cohort,
       CAST(s.age_q AS INT) AS age_quarters,
       CAST(c.n_cust AS BIGINT) AS cohort_size,
       ROUND(CAST(s.spend AS DOUBLE) / c.n_cust, 2) AS spend_per_customer
FROM spend s JOIN cust c ON s.cohort_q = c.cohort_q
ORDER BY cohort, age_quarters
"""

QUERIES["q_cohort_ltv"] = QuerySpec(
    q_cohort_ltv,
    Q_COHORT_LTV_SQL,
    "cohort LTV: spend per customer by acquisition quarter × age — "
    "the revenue side of q_cohort_retention; decimal-exact sums",
)

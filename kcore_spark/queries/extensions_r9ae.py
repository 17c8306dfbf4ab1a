"""Round-9 surface extensions, batch AE (SURVEY §2.3 N r9): the
fairness-slice report — the responsible-AI readout that every scored
dataset ships with: per-subgroup positive rate with its Wilson-style
normal CI, plus the max-disparity summary row (demographic-parity
gap). Subgroups are market segments; the "score" is the pinned
ever-purchases outcome the A/B family shares.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
One partial-agg pass to |segments| rows; integer counts to the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_fairness_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    buyers = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("pos", F.lit(1))
    )
    scored = cust.join(buyers, "c_custkey", "left").na.fill({"pos": 0})
    per_seg = scored.groupBy(F.col("c_mktsegment").alias("slice")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    rate = F.col("p") / F.col("n")
    se = F.sqrt(rate * (1.0 - rate) / F.col("n"))
    slices = per_seg.select(
        "slice",
        F.col("n").cast("long").alias("n"),
        F.round(rate, 6).alias("rate"),
        F.round(rate - 1.96 * se, 6).alias("ci_low"),
        F.round(rate + 1.96 * se, 6).alias("ci_high"),
    )
    disparity = per_seg.agg(
        F.lit("__disparity__").alias("slice"),
        F.sum("n").cast("long").alias("n"),
        F.round(F.max(F.col("p") / F.col("n")) - F.min(F.col("p") / F.col("n")), 6).alias("rate"),
        F.lit(None).cast("double").alias("ci_low"),
        F.lit(None).cast("double").alias("ci_high"),
    )
    return slices.unionByName(disparity).orderBy("slice")


Q_FAIRNESS_SQL = """
WITH scored AS (
  SELECT c.c_mktsegment AS slice,
         CASE WHEN c.c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
              THEN 1 ELSE 0 END AS pos
  FROM customer c),
per_seg AS (
  SELECT slice, COUNT(*) AS n, SUM(pos) AS p FROM scored GROUP BY slice)
SELECT slice, CAST(n AS BIGINT) AS n,
       ROUND(p * 1.0 / n, 6) AS rate,
       ROUND(p * 1.0 / n - 1.96 * SQRT(p * 1.0 / n * (1.0 - p * 1.0 / n) / n), 6)
         AS ci_low,
       ROUND(p * 1.0 / n + 1.96 * SQRT(p * 1.0 / n * (1.0 - p * 1.0 / n) / n), 6)
         AS ci_high
FROM per_seg
UNION ALL
SELECT '__disparity__', CAST(SUM(n) AS BIGINT),
       ROUND(MAX(p * 1.0 / n) - MIN(p * 1.0 / n), 6),
       NULL, NULL
FROM per_seg
ORDER BY slice
"""

QUERIES["q_fairness_slices"] = QuerySpec(
    q_fairness_slices,
    Q_FAIRNESS_SQL,
    "fairness-slice report: per-segment positive rate with normal CI "
    "plus the demographic-parity gap row — |segments|-row output",
)

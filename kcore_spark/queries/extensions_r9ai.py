"""Round-9 surface extensions, batch AI (SURVEY §2.3 N r9): effective
sample size of a weighted sample — ESS = (Σw)²/Σw², the one-number
diagnostic that decides whether importance/size-biased weights (the
q_dsir_importance / q_weighted_sample family) are usable or
degenerate. Weights here are the size-biased o_totalprice (the
q_weighted_sample convention); DECIMAL-exact weight sums.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("w")
    )
    m = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").cast("decimal(38,2)").alias("sw"),
        F.sum(F.col("w").cast("decimal(19,2)") * F.col("w").cast("decimal(19,2)"))
        .cast("decimal(38,4)")
        .alias("sww"),
    )
    ess = (
        F.col("sw").cast("double") * F.col("sw").cast("double")
        / F.col("sww").cast("double")
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n"), 6).alias("ess_ratio"),
    )


Q_ESS_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sw,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))
                  * CAST(o_totalprice AS DECIMAL(19,2))) AS DECIMAL(38,4)) AS sww
  FROM orders)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE), 4) AS ess,
       ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE) / n, 6)
         AS ess_ratio
FROM m
"""

QUERIES["q_effective_sample_size"] = QuerySpec(
    q_effective_sample_size,
    Q_ESS_SQL,
    "effective sample size (Σw)²/Σw² of size-biased weights — the "
    "importance-weighting usability diagnostic; decimal-exact sums",
)

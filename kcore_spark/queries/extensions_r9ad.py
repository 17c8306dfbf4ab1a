"""Round-9 surface extensions, batch AD (SURVEY §2.3 N r9): the
per-column profile (cardinality / null rate / top-value share for
every column of a table — the first DQ report run against any new
dataset; q_profile_orders histograms NUMERICS, this profiles ALL
columns structurally), and the sampled pair-count estimator (predict
a near-dup job's output size from an md5 sample before paying for the
full run — the capacity-planning step in front of q_embedding_neardup
and friends).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.similarity import NORM_CTE, with_norm

QUERIES: dict[str, QuerySpec] = {}

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = None
    for c in _PROFILE_COLS:
        top = (
            orders.groupBy(F.col(c).cast("string").alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("v"))
            .limit(1)
            .select(F.col("v").alias("top_value"), F.col("cnt").alias("top_n"))
        )
        stats = orders.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.sum(F.col(c).isNull().cast("int")).alias("n_null"),
        )
        r = stats.crossJoin(F.broadcast(top)).select(
            "column_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("n_null").cast("long").alias("n_null"),
            "top_value",
            F.round(F.col("top_n") / F.col("n_rows"), 6).alias("top_share"),
        )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("column_name")


def _profile_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""
SELECT '{c}' AS column_name,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(DISTINCT {c}) FROM orders) AS BIGINT) AS n_distinct,
       CAST((SELECT SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) FROM orders) AS BIGINT) AS n_null,
       (SELECT CAST({c} AS VARCHAR) FROM orders GROUP BY {c}
        ORDER BY COUNT(*) DESC, CAST({c} AS VARCHAR) LIMIT 1) AS top_value,
       (SELECT ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders), 6)
        FROM orders GROUP BY {c}
        ORDER BY COUNT(*) DESC, CAST({c} AS VARCHAR) LIMIT 1) AS top_share"""
        )
    return " UNION ALL ".join(parts) + "\nORDER BY column_name"


QUERIES["q_column_profile"] = QuerySpec(
    q_column_profile,
    _profile_sql(),
    "per-column DQ profile: cardinality, null rate, top-value share "
    "for every orders column — the first report on any new dataset",
)


# ----------------------- sampled pair-count estimator (planning)
# Estimate the τ=0.3 blocked near-dup pair count from a 50% md5
# sample: pairs scale as the square of the sampling rate within each
# block, so estimate = sample_pairs / rate². The output pins estimate
# AND exact side by side — the capacity-planning answer to "how big
# will the dedup job's output be", for the cost of a quarter of the
# pair work.

_SAMPLE_RATE = 0.5


def q_sample_pair_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    n = with_norm(emb, "embedding", "vec_id").join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    u = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    n = n.withColumn("in_sample", (u % 2 == 0).cast("int"))
    a = n.withColumnsRenamed({"id": "id1", "e": "e1", "nrm": "n1", "in_sample": "s1"})
    b = n.select(
        F.col("id").alias("id2"), F.col("e").alias("e2"),
        F.col("nrm").alias("n2"), "label", F.col("in_sample").alias("s2"),
    )
    pairs = (
        a.join(b, "label")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "s1", "s2",
            cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")).alias("sim"),
        )
        .where(F.col("sim") >= 0.3)
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("exact_pairs"),
        F.sum((F.col("s1") * F.col("s2"))).cast("long").alias("sample_pairs"),
        F.round(
            F.sum(F.col("s1") * F.col("s2")) / F.lit(_SAMPLE_RATE * _SAMPLE_RATE), 2
        ).alias("estimated_pairs"),
    )


Q_SAMPLE_EST_SQL = f"""
WITH {NORM_CTE},
nl AS (
  SELECT n.vec_id, n.e, n.nrm, emb.label,
         CASE WHEN ('0x' || substring(md5(CAST(n.vec_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
              THEN 1 ELSE 0 END AS in_sample
  FROM n JOIN embeddings emb ON emb.vec_id = n.vec_id),
pairs AS (
  SELECT a.in_sample AS s1, b.in_sample AS s2
  FROM nl a JOIN nl b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.3)
SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
       CAST(SUM(s1 * s2) AS BIGINT) AS sample_pairs,
       ROUND(SUM(s1 * s2) / {_SAMPLE_RATE * _SAMPLE_RATE}, 2) AS estimated_pairs
FROM pairs
"""

QUERIES["q_sample_pair_estimate"] = QuerySpec(
    q_sample_pair_estimate,
    Q_SAMPLE_EST_SQL,
    "sampled near-dup pair-count estimator (50% md5 sample, rate² "
    "scale-up) vs the exact count — the dedup capacity planner",
)

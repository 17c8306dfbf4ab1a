"""Round-9 surface extensions, batch AA (SURVEY §2.3 N r9): padding-
waste analysis — the batch-inference cost planner. For each candidate
bucket size, every document pads up to its bucket ceiling; the waste
ratio (padded−real)/padded is THE number that decides the bucketing
config before an expensive inference run. Complements q_pack_sequences
(which packs to eliminate padding) by quantifying what naive bucketing
costs.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
One scan; the bucket grid is a 4-row broadcast fan-out; integer token
counts until the final ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_PAD_BUCKETS = [64, 128, 256, 512]


def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    grid = spark.createDataFrame([(b,) for b in _PAD_BUCKETS], "bucket int")
    fanned = docs.crossJoin(F.broadcast(grid)).select(
        "bucket",
        "n_tok",
        # pad to the next multiple of bucket (docs longer than one
        # bucket span multiple — the chunked-inference convention)
        (F.ceil(F.col("n_tok") / F.col("bucket")) * F.col("bucket")).alias("padded"),
    )
    return (
        fanned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("real_tokens"),
            F.sum("padded").cast("long").alias("padded_tokens"),
        )
        .withColumn(
            "waste_ratio",
            F.round(
                (F.col("padded_tokens") - F.col("real_tokens"))
                / F.col("padded_tokens"),
                6,
            ),
        )
        .orderBy("bucket")
    )


Q_PADDING_SQL = f"""
WITH docs AS (
  SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
grid AS (SELECT unnest([{', '.join(str(b) for b in _PAD_BUCKETS)}]) AS bucket),
fanned AS (
  SELECT bucket, n_tok,
         CAST(CEIL(n_tok * 1.0 / bucket) AS BIGINT) * bucket AS padded
  FROM docs CROSS JOIN grid)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
       CAST(SUM(padded) AS BIGINT) AS padded_tokens,
       ROUND((SUM(padded) - SUM(n_tok)) * 1.0 / SUM(padded), 6) AS waste_ratio
FROM fanned
GROUP BY bucket
ORDER BY bucket
"""

QUERIES["q_padding_waste"] = QuerySpec(
    q_padding_waste,
    Q_PADDING_SQL,
    "padding-waste planner: per candidate bucket size, real vs padded "
    "tokens and the waste ratio — the batch-inference cost decision",
)

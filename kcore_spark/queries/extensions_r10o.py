"""Round-10 surface extensions, batch O (SURVEY §2.3 N r10): the
semantics-pin / capacity block — null-safe equality joins (Spark
``<=>`` == DuckDB IS NOT DISTINCT FROM), empty-input aggregate
semantics (COUNT 0 vs NULL-valued SUM/AVG/MIN), and the row-width
partition planner (estimated bytes/row -> recommended partition
count at the 128 MB split target).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer counts and length sums; the planner's width
estimate uses fixed per-type widths plus exact string-length sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------------------- null-safe equality join
# Customers with nation 3 are mapped to a NULL key (the unknown-
# origin rows of a real pipeline); a plain equi-join DROPS them, the
# null-safe join (<=> / IS NOT DISTINCT FROM) matches them to the
# dim's explicit NULL bucket. Output compares both join modes —
# the semantics pin. The dim is 4 rows, broadcast.


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_nationkey") == 3, F.lit(None).cast("long"))
        .otherwise(F.col("c_nationkey").cast("long"))
        .alias("nk")
    )
    dim = spark.createDataFrame(
        [(0, "bucket_0"), (1, "bucket_1"), (2, "bucket_2"), (None, "bucket_unknown")],
        "nk_d long, bucket string",
    )
    safe = (
        cust.join(F.broadcast(dim), F.col("nk").eqNullSafe(F.col("nk_d")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_safe"))
    )
    plain = (
        cust.join(F.broadcast(dim), F.col("nk") == F.col("nk_d"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_plain"))
    )
    return (
        safe.join(plain, "bucket", "left")
        .na.fill({"n_plain": 0})
        .select(
            "bucket",
            F.col("n_safe").cast("long").alias("n_safe"),
            F.col("n_plain").cast("long").alias("n_plain"),
        )
        .orderBy("bucket")
    )


Q_NULLSAFE_SQL = """
WITH cust AS (
  SELECT CASE WHEN c_nationkey = 3 THEN NULL
              ELSE CAST(c_nationkey AS BIGINT) END AS nk
  FROM customer),
dim(nk_d, bucket) AS (
  VALUES (0, 'bucket_0'), (1, 'bucket_1'), (2, 'bucket_2'),
         (NULL, 'bucket_unknown')),
safe AS (
  SELECT bucket, COUNT(*) AS n_safe
  FROM cust JOIN dim ON cust.nk IS NOT DISTINCT FROM dim.nk_d
  GROUP BY bucket),
plain AS (
  SELECT bucket, COUNT(*) AS n_plain
  FROM cust JOIN dim ON cust.nk = dim.nk_d
  GROUP BY bucket)
SELECT s.bucket, CAST(s.n_safe AS BIGINT) AS n_safe,
       CAST(COALESCE(p.n_plain, 0) AS BIGINT) AS n_plain
FROM safe s LEFT JOIN plain p USING (bucket)
ORDER BY s.bucket
"""

QUERIES["q_null_safe_join"] = QuerySpec(
    q_null_safe_join,
    Q_NULLSAFE_SQL,
    "null-safe vs plain equality join against a dim with an explicit "
    "NULL bucket (<=> / IS NOT DISTINCT FROM) — semantics pin",
)


# ------------------------------------ empty-input aggregate semantics
# The SQL-standard pin every engine must honor: over an empty input,
# COUNT is 0 while SUM/AVG/MIN/MAX are NULL. One always-false filter
# on orders, plus the non-empty contrast on the same expressions.


def q_empty_agg_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    empty = orders.where(F.col("o_orderkey") < 0).agg(
        F.lit("empty").alias("input_kind"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        # avg as an explicit sum/count in DOUBLE: Spark's decimal AVG
        # result scale (6) truncates differently from DuckDB's double avg
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
    )
    full = orders.agg(
        F.lit("full").alias("input_kind"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
    )
    return empty.unionByName(full).orderBy("input_kind")


Q_EMPTY_SQL = """
SELECT 'empty' AS input_kind, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4) AS avg_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders WHERE o_orderkey < 0
UNION ALL
SELECT 'full', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4),
       CAST(MIN(o_orderkey) AS BIGINT)
FROM orders
ORDER BY input_kind
"""

QUERIES["q_empty_agg_semantics"] = QuerySpec(
    q_empty_agg_semantics,
    Q_EMPTY_SQL,
    "empty-input aggregate semantics (COUNT 0, NULL SUM/AVG/MIN) vs "
    "the full-input contrast — the SQL-standard pin",
)


# ----------------------------------------- row-width partition planner
# Estimated serialized width per row (fixed widths for numerics/dates
# + exact string-length sums + array payloads), total estimated bytes,
# and the partition count a 128 MB files.maxPartitionBytes target
# implies — the capacity arithmetic behind every ingest config.
# One aggregate scan per profiled table.

_TARGET_BYTES = 128 * 1024 * 1024


def q_row_width_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").agg(
        F.lit("documents").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        # doc_id(8) + n_chars(8) + text/lang/source string bytes
        (
            F.sum(
                F.length("text") + F.length("lang") + F.length("source") + 16
            )
        ).alias("est_bytes"),
    )
    ev = load_table(spark, sf_dir, "events").agg(
        F.lit("events").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        # event_id(8) + ts(8) + user_id(8) + value(8) + strings
        (
            F.sum(F.length("event_type") + F.length("props") + 32)
        ).alias("est_bytes"),
    )
    emb = load_table(spark, sf_dir, "embeddings").agg(
        F.lit("embeddings").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        # vec_id(8) + label(4) + 4 bytes per float element
        F.sum(F.size("embedding") * 4 + 12).alias("est_bytes"),
    )
    u = docs.unionByName(ev).unionByName(emb)
    return u.select(
        "table_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("est_bytes").cast("long").alias("est_bytes"),
        F.expr("est_bytes div n_rows").cast("long").alias("bytes_per_row"),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("est_bytes") / F.lit(_TARGET_BYTES)).cast("long"),
        ).alias("partitions_at_128mb"),
    ).orderBy("table_name")


Q_WIDTH_SQL = f"""
WITH profiles AS (
  SELECT 'documents' AS table_name, COUNT(*) AS n_rows,
         SUM(LENGTH(text) + LENGTH(lang) + LENGTH(source) + 16) AS est_bytes
  FROM documents
  UNION ALL
  SELECT 'events', COUNT(*),
         SUM(LENGTH(event_type) + LENGTH(props) + 32)
  FROM events
  UNION ALL
  SELECT 'embeddings', COUNT(*), SUM(len(embedding) * 4 + 12)
  FROM embeddings)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(est_bytes AS BIGINT) AS est_bytes,
       CAST(est_bytes // n_rows AS BIGINT) AS bytes_per_row,
       CAST(GREATEST(1, CEIL(est_bytes / {_TARGET_BYTES}.0)) AS BIGINT)
         AS partitions_at_128mb
FROM profiles
ORDER BY table_name
"""

QUERIES["q_row_width_planner"] = QuerySpec(
    q_row_width_planner,
    Q_WIDTH_SQL,
    "row-width estimate + partition count at the 128 MB split target "
    "for the three payload tables — ingest capacity arithmetic",
)

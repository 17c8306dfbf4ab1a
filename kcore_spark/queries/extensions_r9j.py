"""Round-9 surface extensions, batch J (SURVEY §2.3 N r9): four
engine-surface rows — Spark 4 COLLATION-aware grouping (UTF8_LCASE),
schema-evolution reads (mergeSchema over heterogeneous parquet), file
provenance via the _metadata hidden column (per-file row accounting,
the small-files/debugging primitive), and the stream-stream LEFT SEMI
join (the "did a view precede this purchase?" existence probe — state
holds only the probe side, no output amplification).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Staged inputs are derived deterministically from the fixtures so the
DuckDB oracle can recompute them from the registered views.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.streaming.ops import events_stream, run_to_table

QUERIES: dict[str, QuerySpec] = {}


# --------------------------- collation-aware grouping (UTF8_LCASE)
# Spark 4 collations move case rules into the TYPE, so GROUP BY /
# comparisons / joins honor them without lower() rewrites scattered
# through the query (and the optimizer still prunes/pushes through
# them). Mixed-case keys are synthesized deterministically (md5 parity
# flips the segment to lowercase), grouped under UTF8_LCASE, and the
# output is canonicalized through the BINARY min so the row values are
# engine-stable. Scale: plain partial-agg groupBy; collation changes
# the comparator, not the plan.


def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    u = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    mixed = cust.select(
        F.when(u % 2 == 0, F.lower(F.col("c_mktsegment")))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    collated = mixed.select(F.expr("collate(seg, 'UTF8_LCASE')").alias("seg_ci"))
    return (
        collated.groupBy("seg_ci")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # BINARY min over the collation group: deterministic
            # canonical representative (uppercase sorts before lower)
            F.min(F.expr("collate(seg_ci, 'UTF8_BINARY')")).alias("canonical"),
        )
        .select(F.lower(F.col("seg_ci")).alias("segment"), "canonical", "n")
        .orderBy("segment")
    )


Q_COLLATED_SQL = """
WITH mixed AS (
  SELECT CASE WHEN ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
              THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg
  FROM customer)
SELECT lower(seg) AS segment, MIN(seg) AS canonical, COUNT(*) AS n
FROM mixed
GROUP BY lower(seg)
ORDER BY segment
"""

QUERIES["q_collated_group"] = QuerySpec(
    q_collated_group,
    Q_COLLATED_SQL,
    "Spark 4 UTF8_LCASE collation: case-insensitive GROUP BY via the "
    "type system (no lower() rewrite), canonicalized through binary min",
)


# ------------------------------ schema-evolution read (mergeSchema)
# Two generations of a table land with different columns (v1: price
# only; v2: priority + custkey). mergeSchema=true reconciles them at
# scan time — the schema-on-read contract every long-lived lakehouse
# table needs. The aggregate proves null-padding semantics: v1 rows
# have no priority, v2 rows no price. Staged once per sf_dir from a
# deterministic orderkey-parity split so the oracle recomputes it from
# the orders view.

_MERGE_STAGED: dict[str, str] = {}


def _stage_two_generations(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _MERGE_STAGED:
        return _MERGE_STAGED[sf_dir]
    d = tempfile.mkdtemp(prefix="kcore_schema_evo_")
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    v1.coalesce(2).write.mode("overwrite").parquet(os.path.join(d, "gen=1"))
    v2.coalesce(2).write.mode("overwrite").parquet(os.path.join(d, "gen=2"))
    _MERGE_STAGED[sf_dir] = d
    return d


def q_schema_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage_two_generations(spark, sf_dir)
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("o_totalprice").cast("long").alias("n_with_price"),
        F.count("o_orderpriority").cast("long").alias("n_with_priority"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "price_sum"
        ),
        F.count_distinct("o_custkey").cast("long").alias("custs_v2"),
    )


Q_SCHEMA_MERGE_SQL = """
WITH unioned AS (
  SELECT o_orderkey, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority, CAST(NULL AS BIGINT) AS o_custkey
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, NULL, o_orderpriority, o_custkey
  FROM orders WHERE o_orderkey % 2 = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_totalprice) AS BIGINT) AS n_with_price,
       CAST(COUNT(o_orderpriority) AS BIGINT) AS n_with_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs_v2
FROM unioned
"""

QUERIES["q_schema_merge_read"] = QuerySpec(
    q_schema_merge_read,
    Q_SCHEMA_MERGE_SQL,
    "schema-evolution read: mergeSchema over two parquet generations "
    "with disjoint columns — null-padding semantics pinned by counts",
)


# ------------------------- file provenance via _metadata column
# Per-input-file row accounting through the _metadata hidden column —
# the primitive behind small-file audits, bad-file quarantine, and
# ingest reconciliation. Three deterministic priority slices are
# staged into three subdirectories; the query reads the parent and
# groups by the slice name extracted from _metadata.file_path. The
# oracle recomputes each slice from the orders view. Scale: _metadata
# is generated at scan time per split — no extra I/O, no shuffle
# beyond the |files|-sized groupBy.

_PROV_STAGED: dict[str, str] = {}


def _stage_slices(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _PROV_STAGED:
        return _PROV_STAGED[sf_dir]
    d = tempfile.mkdtemp(prefix="kcore_file_prov_")
    orders = load_table(spark, sf_dir, "orders")
    slices = {
        "urgent": F.col("o_orderpriority") == "1-URGENT",
        "high": F.col("o_orderpriority") == "2-HIGH",
        "rest": ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
    }
    for name, cond in slices.items():
        orders.where(cond).select("o_orderkey", "o_totalprice").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(d, f"slice_{name}"))
    _PROV_STAGED[sf_dir] = d
    return d


def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage_slices(spark, sf_dir)
    df = spark.read.option("recursiveFileLookup", "true").parquet(d)
    return (
        df.select(
            F.regexp_extract(F.col("_metadata.file_path"), r"slice_(\w+)/", 1).alias(
                "slice"
            ),
            "o_totalprice",
        )
        .groupBy("slice")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "price_sum"
            ),
        )
        .orderBy("slice")
    )


Q_FILE_PROV_SQL = """
SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
            WHEN o_orderpriority = '2-HIGH' THEN 'high'
            ELSE 'rest' END AS slice,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
FROM orders
GROUP BY 1
ORDER BY slice
"""

QUERIES["q_file_provenance"] = QuerySpec(
    q_file_provenance,
    Q_FILE_PROV_SQL,
    "per-file row accounting via the _metadata hidden column over a "
    "multi-file layout — the small-file/ingest-reconciliation primitive",
)


# ------------------------------------ stream-stream LEFT SEMI join
# Purchases that had at least one view by the same user in the
# preceding 10 minutes — an EXISTENCE probe, not an enrichment: the
# semi join emits each purchase at most once regardless of how many
# views matched, so state discards matched probe rows at the
# watermark and there is no row amplification (the inner-join variant
# q_stream_stream_join measures exactly that amplification).


def q_stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    semi = purchases.join(
        views,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts"
        ),
        "left_semi",
    )
    out = run_to_table(semi.select("p_event", "p_user"), "append")
    return (
        out.groupBy("p_user")
        .agg(F.count(F.lit(1)).cast("long").alias("n_preceded_purchases"))
        .orderBy("p_user")
    )


Q_STREAM_SEMI_SQL = """
SELECT p.user_id AS p_user, CAST(COUNT(*) AS BIGINT) AS n_preceded_purchases
FROM events p
WHERE p.event_type = 'purchase'
  AND EXISTS (
    SELECT 1 FROM events v
    WHERE v.event_type = 'view' AND v.user_id = p.user_id
      AND v.ts >= p.ts - INTERVAL 10 MINUTE AND v.ts < p.ts)
GROUP BY p.user_id
ORDER BY p_user
"""

QUERIES["q_stream_stream_semi_join"] = QuerySpec(
    q_stream_stream_semi_join,
    Q_STREAM_SEMI_SQL,
    "stream-stream LEFT SEMI join: purchases preceded by a view "
    "within 10 minutes — existence probe, no output amplification",
)

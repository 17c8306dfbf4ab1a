"""Source coverage (SURVEY §2.3 A): CSV and JSON file sources with
schema inference, and in-memory tables via createDataFrame — each
round-tripped through a real file in a temp dir, then oracle-checked
against the original fixture content.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

_STAGED: dict[tuple[str, str], str] = {}


def _stage(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write a fixture out in fmt once per (sf_dir, fmt)."""
    key = (sf_dir, fmt)
    if key not in _STAGED:
        d = tempfile.mkdtemp(prefix=f"kcore_{fmt}_src_")
        if fmt == "csv":
            cust = load_table(spark, sf_dir, "customer")
            cust.coalesce(4).write.mode("overwrite").option("header", True).csv(
                os.path.join(d, "customer_csv")
            )
        elif fmt == "orc":
            li = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
            )
            li.coalesce(4).write.mode("overwrite").orc(os.path.join(d, "lineitem_orc"))
        elif fmt == "xml":
            nat = load_table(spark, sf_dir, "nation").select(
                "n_nationkey", "n_name", "n_regionkey"
            )
            nat.coalesce(1).write.mode("overwrite").format("xml").option(
                "rootTag", "nations"
            ).option("rowTag", "nation").save(os.path.join(d, "nation_xml"))
        else:
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "event_type", "user_id", "value"
            )
            ev.coalesce(4).write.mode("overwrite").json(os.path.join(d, "events_json"))
        _STAGED[key] = d
    return _STAGED[key]


def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage(spark, sf_dir, "csv")
    cust = spark.read.option("header", True).option("inferSchema", True).csv(
        os.path.join(d, "customer_csv")
    )
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


Q_CSV_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
"""


def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage(spark, sf_dir, "json")
    ev = spark.read.json(os.path.join(d, "events_json"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_ids"),
            F.count_distinct("user_id").alias("users"),
        )
        .orderBy("event_type")
    )


Q_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids,
       COUNT(DISTINCT user_id) AS users
FROM events
GROUP BY event_type
"""


def q_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory dimension via createDataFrame, broadcast-joined."""
    dim = spark.createDataFrame(
        [
            ("BUILDING", "construction"),
            ("AUTOMOBILE", "vehicles"),
            ("MACHINERY", "industrial"),
            ("HOUSEHOLD", "consumer"),
            ("FURNITURE", "consumer"),
        ],
        "seg string, sector string",
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(dim), cust.c_mktsegment == dim.seg)
        .groupBy("sector")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("sector")
    )


Q_INLINE_DIM_SQL = """
SELECT sector, COUNT(*) AS n_customers
FROM customer
JOIN (VALUES ('BUILDING','construction'), ('AUTOMOBILE','vehicles'),
             ('MACHINERY','industrial'), ('HOUSEHOLD','consumer'),
             ('FURNITURE','consumer')) AS dim(seg, sector)
  ON c_mktsegment = seg
GROUP BY sector
"""


QUERIES = {
    "q_csv_source": QuerySpec(q_csv_source, Q_CSV_SQL, "CSV source + schema inference"),
    "q_json_source": QuerySpec(q_json_source, Q_JSON_SQL, "JSON-lines source"),
    "q_inline_dim_join": QuerySpec(q_inline_dim_join, Q_INLINE_DIM_SQL, "createDataFrame dim"),
}


def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ORC source (columnar alternative to parquet): fixture
    round-tripped through ORC files, then aggregated — predicate/
    column pushdown applies to the ORC scan exactly as to parquet."""
    d = _stage(spark, sf_dir, "orc")
    li = spark.read.orc(os.path.join(d, "lineitem_orc"))
    return (
        li.where(F.col("l_quantity") < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)")).cast("double").alias("total"),
        )
        .orderBy("l_returnflag")
    )


Q_ORC_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS total
FROM lineitem
WHERE l_quantity < 10
GROUP BY l_returnflag
"""


QUERIES["q_orc_source"] = QuerySpec(q_orc_source, Q_ORC_SQL, "ORC source (native columnar)")


def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source (Spark 4 integrated the spark-xml reader):
    the nation table is staged as one XML document and read back with
    rowTag row discovery — the ingestion path for XML feeds (SURVEY
    block A; the reference declares no source formats at all). The
    aggregate rides the inferred schema."""
    d = _stage(spark, sf_dir, "xml")
    nat = spark.read.format("xml").option("rowTag", "nation").load(
        os.path.join(d, "nation_xml")
    )
    return (
        nat.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


Q_XML_SQL = """
SELECT n_regionkey, COUNT(*) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""

QUERIES["q_xml_source"] = QuerySpec(
    q_xml_source, Q_XML_SQL, "native XML source (Spark 4 built-in), rowTag read-back"
)

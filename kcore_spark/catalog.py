"""Catalog: registers the fixture parquet tables as temp views.

Analog of the reference's (declared, unimplemented) Metadata/topic
catalog surface (`/root/reference/README.md:50` — Topic Management);
here the catalog is a thin mapping table-name → parquet path plus the
type normalizations the engine guarantees:

- ``events.ts`` arrives as parquet TIMESTAMP(NANOS); Spark has no ns
  timestamp, so we read it as long (see session.py) and truncate to
  microseconds — the same truncation DuckDB's ``CAST(ts AS TIMESTAMP)``
  applies to its TIMESTAMP_NS, keeping the oracle comparable.

Scale note: each table is a plain ``spark.read.parquet`` — predicate
pushdown, column pruning and partition pruning all apply to these scans
unchanged on a 100 TB layout (directory-partitioned topics, see
sources/topic_log.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_engine_confs(spark: SparkSession) -> None:
    """Defensively pin the session confs correctness depends on —
    the driver's verify harness builds its own SparkSession, which may
    not carry session.py's config:

    - nanosAsLong: without it, reading the ns-timestamp events table
      throws PARQUET_TYPE_ILLEGAL;
    - UTC session timezone: epoch/unix_timestamp outputs are
      timezone-dependent, and the DuckDB oracle treats naive
      timestamps as UTC.

    Both are runtime-settable session confs (verified); setting them
    repeatedly is idempotent.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # INT96 (the default) writes no footer min/max stats; MICROS does,
    # and the topic-log manifest's timestamp index is built from them
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying engine type normalizations."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # ns → µs truncation; integer `div` — float division loses ns
        # precision above 2^53 and can shift the resulting microsecond.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

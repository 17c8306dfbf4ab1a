"""Catalog: registers the fixture parquet tables as temp views.

Analog of the reference's (declared, unimplemented) Metadata/topic
catalog surface (`/root/reference/README.md:50` — Topic Management);
here the catalog is a thin mapping table-name → parquet path plus the
type normalizations the engine guarantees:

- ``events.ts`` has shipped in two encodings across fixture
  generations: parquet TIMESTAMP(NANOS) (read as long under
  ``nanosAsLong``, truncated here to µs) and plain ``timestamp[us]``
  (read as TIMESTAMP_NTZ, cast to the session-TZ timestamp). The
  engine accepts BOTH — ``normalize_event_ts`` branches on the column's
  actual dataType, so a fixture regeneration can never silently change
  query semantics (tests/test_schema_drift.py pins this).

Scale note: each table is a plain ``spark.read.parquet`` — predicate
pushdown, column pruning and partition pruning all apply to these scans
unchanged on a 100 TB layout (directory-partitioned topics, see
sources/topic_log.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

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

    - nanosAsLong: without it, reading an old ns-encoded events fixture
      throws PARQUET_TYPE_ILLEGAL; vestigial for timestamp[us] fixtures
      (the current generation) but kept for robustness — it only
      affects TIMESTAMP(NANOS) columns, which nothing else has;
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


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-TZ TIMESTAMP regardless
    of how the parquet fixture encoded it. The ONE place the engine's
    event-time type assumption lives — catalog, streaming source, and
    operators all route through here, so a fixture regeneration changes
    behavior in exactly one function (or fails test_schema_drift.py).

    - INT64 (legacy TIMESTAMP(NANOS) under ``nanosAsLong``): integer
      ``div 1000`` to µs — float division loses ns precision above 2^53
      and can shift the resulting microsecond;
    - TIMESTAMP_NTZ (parquet timestamp[us], isAdjustedToUTC=false): cast
      to TIMESTAMP — wall-clock-preserving under the UTC session TZ;
    - TIMESTAMP: already the engine type, pass through.
    """
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying engine type normalizations."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

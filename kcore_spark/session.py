"""SparkSession factory.

One place to encode the engine's execution-model decisions so every
entrypoint (tests, bench, driver verify, protocol front-end) runs with
the same plan-shaping config:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — the 100 TB story leans on AQE instead of hand-tuned
  partition counts.
- Arrow on for every Python<->JVM hop (pandas_udf / applyInPandas /
  toPandas) — row-at-a-time Python is banned from hot paths.
- Session timezone UTC so timestamp results are oracle-stable.
- ``nanosAsLong`` so legacy parquet TIMESTAMP(NANOS) events fixtures
  stay readable (current fixtures are timestamp[us]; the conf is inert
  for them). All event-time type handling funnels through
  ``catalog.normalize_event_ts`` — see tests/test_schema_drift.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kcore_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    At cluster scale the same config applies unchanged: AQE coalesces the
    32-default shuffle partitions up to whatever
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` allows,
    so shuffle_partitions here is a floor for local runs, not a cap for
    the cluster.
    """
    # Activate the vendored protobuf runtime (kcore_spark.vendor) BEFORE
    # the JVM gateway launches: workers inherit the gateway's
    # $PYTHONPATH, and transformWithStateInPandas imports
    # StateMessage_pb2 inside every Python worker.
    from kcore_spark.vendor import ensure_protobuf

    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/kcore_spark_warehouse")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()

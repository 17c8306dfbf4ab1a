"""kcore_spark — a PySpark-native analytics + event-streaming engine.

Re-expresses the capabilities of the reference broker (kcore-io/kcore,
a prototype Kafka-protocol broker — see SURVEY.md) Spark-first:

- ``kcore_spark.session``  : SparkSession factory tuned for the engine
- ``kcore_spark.catalog``  : table registry over the parquet fixtures
- ``kcore_spark.sources``  : topic log (produce / fetch / offsets) — the
  Kafka data model (topic → partition → offset) on partitioned parquet
- ``kcore_spark.operators``: relational, dedup, similarity, text ops
- ``kcore_spark.streaming``: Structured Streaming surface
- ``kcore_spark.protocol`` : asyncio Kafka wire front-end (ApiVersions &c.)
- ``kcore_spark.queries``  : the declared query inventory (SURVEY §2.3)
  with DuckDB oracle SQL for the correctness gate
"""

__version__ = "0.1.0"

"""Incremental streaming over the topic log with a PERSISTENT
checkpoint: each availableNow run processes only newly-produced
segments (the Kafka consumer-group resume contract), and the combined
sink equals the batch answer with no duplicates."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog
from kcore_spark.streaming.ops import run_incremental


@pytest.fixture()
def log(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_inc_") as d:
        yield TopicLog(spark, d)


def _records(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.encode((F.col("id") % 5).cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


def test_incremental_runs_process_only_new_segments(spark, log):
    log.create_topic("t", 2)
    log.produce("t", _records(spark, 40), order_by=["seq"])
    work = tempfile.mkdtemp(prefix="kcore_inc_sink_")
    ckpt, sink = os.path.join(work, "ckpt"), os.path.join(work, "out")

    stream = log.read_stream("t").select(
        "partition", "offset", F.decode("value", "utf-8").alias("v")
    )
    run_incremental(stream, ckpt, sink)
    first = spark.read.parquet(sink)
    assert first.count() == 40

    # produce more; the SAME checkpoint must pick up only the new files
    log.produce("t", _records(spark, 25, start=40), order_by=["seq"])
    stream2 = log.read_stream("t").select(
        "partition", "offset", F.decode("value", "utf-8").alias("v")
    )
    run_incremental(stream2, ckpt, sink)
    combined = spark.read.parquet(sink)
    assert combined.count() == 65  # no reprocessing, no gaps
    # exactly-once per offset: (partition, offset) unique
    assert combined.select("partition", "offset").distinct().count() == 65
    # and the sink equals the batch scan
    batch = {(r["partition"], r["offset"]) for r in log.scan("t").select("partition", "offset").collect()}
    got = {(r["partition"], r["offset"]) for r in combined.collect()}
    assert got == batch

    # a third run with nothing new appends nothing
    run_incremental(
        log.read_stream("t").select("partition", "offset", F.decode("value", "utf-8").alias("v")),
        ckpt,
        sink,
    )
    assert spark.read.parquet(sink).count() == 65

"""Concurrent-writer stress for the per-partition commit-lock model.

The design claim (sources/topic_log.py::produce): producers targeting
DISJOINT declared partition sets of one topic run fully in parallel,
while same-partition producers serialize — and in both cases every
partition ends with dense offsets and no lost batches. The targeted
lock tests pin single interleavings; this suite stresses many
interleavings with real threads (flock is per-open-file-description,
so two threads exclude each other exactly like two processes).
"""

from __future__ import annotations

import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog


@pytest.fixture()
def log(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_conc_") as d:
        yield TopicLog(spark, d)


def _batch(spark, n, start, part):
    return spark.range(start, start + n).select(
        F.encode(F.concat(F.lit("k"), F.col("id").cast("string")), "utf-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
        F.col("id").alias("seq"),
        F.lit(part).alias("p"),
    )


def _produce_loop(log, spark, topic, part, n_batches, batch_rows, errors):
    try:
        for i in range(n_batches):
            df = _batch(spark, batch_rows, i * batch_rows, part)
            log.produce(
                topic,
                df.drop("p"),
                partition_expr=F.lit(part),
                order_by=["seq"],
                partitions=[part],
            )
    except Exception as e:  # noqa: BLE001 - surfaced to the main thread
        errors.append((part, repr(e)))


def _assert_dense(log, topic, expected_per_part: dict[int, int]):
    rows = [(r.partition, r.offset) for r in log.scan(topic).collect()]
    per_part: dict[int, list[int]] = {}
    for p, o in rows:
        per_part.setdefault(p, []).append(o)
    assert set(per_part) == set(expected_per_part)
    for p, offs in per_part.items():
        offs.sort()
        assert offs == list(range(expected_per_part[p])), (
            f"partition {p}: offsets not dense "
            f"(n={len(offs)}, expected {expected_per_part[p]})"
        )


def test_disjoint_partition_writers_in_parallel(spark, log):
    """Two threads, partitions {0} and {1}, 4 batches × 25 rows each:
    both partitions end dense with every batch present."""
    log.create_topic("t", 2)
    errors: list = []
    ts = [
        threading.Thread(
            target=_produce_loop, args=(log, spark, "t", p, 4, 25, errors)
        )
        for p in (0, 1)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert errors == []
    _assert_dense(log, "t", {0: 100, 1: 100})


def test_same_partition_writers_serialize(spark, log):
    """Two threads hammering the SAME partition: the commit lock must
    serialize offset assignment — dense offsets, nothing lost, no
    duplicates."""
    log.create_topic("t", 1)
    errors: list = []
    ts = [
        threading.Thread(
            target=_produce_loop, args=(log, spark, "t", 0, 3, 10, errors)
        )
        for _ in range(2)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert errors == []
    _assert_dense(log, "t", {0: 60})

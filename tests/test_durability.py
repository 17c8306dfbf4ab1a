"""Durability / crash-window regressions (ADVICE r1): produce v5+
response shape, flush-ack ordering, watermark union merge, partition
validation, crash-safe compaction swap, wall-clock commit sequencing."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    WireLog,
    decode_produce_response,
    handle_produce,
)
from kcore_spark.protocol.records import Record, encode_record_batch
from kcore_spark.sources.topic_log import TopicLog


@pytest.fixture()
def log(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_topics_") as d:
        yield TopicLog(spark, d)


def _records(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.encode(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")), "utf-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


# ------------------------------------------------------ produce v5/v6


def _produce_payload(topic: str, partition: int, batch: bytes, version: int) -> bytes:
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(version).int32(7)
    w.nullable_string("t")
    w.nullable_string(None)  # transactional_id
    w.int16(-1).int32(30000)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition)
    w.nullable_bytes(batch)
    return w.bytes()


@pytest.mark.parametrize("version", [3, 4, 5, 6])
def test_produce_response_matches_negotiated_version(version):
    wl = WireLog()
    wl.create_topic("t", 1)
    batch = encode_record_batch([Record(b"k", b"v", 1700000000000)])
    resp = handle_produce(wl, _produce_payload("t", 0, batch, version))
    corr, results, throttle = decode_produce_response(resp, api_version=version)
    assert corr == 7
    [(name, [row])] = results
    assert name == "t" and row[0] == 0 and row[1] == wire.ERR_NONE and row[2] == 0
    if version >= 5:
        assert len(row) == 5 and row[4] == 0  # log_start_offset present
    else:
        assert len(row) == 4
    assert throttle == 0


def test_produce_v5_body_longer_than_v4():
    wl = WireLog()
    wl.create_topic("t", 1)
    batch = encode_record_batch([Record(b"k", b"v", 1700000000000)])
    r4 = handle_produce(wl, _produce_payload("t", 0, batch, 4))
    r5 = handle_produce(wl, _produce_payload("t", 0, batch, 5))
    assert len(r5) == len(r4) + 8  # exactly one int64 log_start_offset


# ------------------------------------------------------ flush ordering


def test_flush_failure_keeps_records_pending(spark, log):
    wl = WireLog()
    wl.create_topic("t", 1)
    wl.append("t", 0, [Record(b"k", b"v", 1700000000000)])
    log.create_topic("t", 1)

    class Boom(Exception):
        pass

    class FailingLog:
        def append_raw(self, topic, df):
            raise Boom()

    with pytest.raises(Boom):
        wl.flush_to_topic_log(spark, FailingLog(), "t")
    # nothing acknowledged: retry flushes the same record successfully
    assert wl.flush_to_topic_log(spark, log, "t") == 1
    assert log.scan("t").count() == 1
    # and it is not double-flushed afterwards
    assert wl.flush_to_topic_log(spark, log, "t") == 0


# ------------------------------------------------------ watermark merge


def test_watermark_union_merge_keeps_unlisted_partition(spark, log):
    log.create_topic("t", 2)
    # simulate an older control file that lost partition 1
    with open(log._wm_path("t"), "w") as f:
        json.dump({"0": 0}, f)
    rows = spark.range(4).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.lit(1).cast("int").alias("partition"),
        F.col("id").cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.lit(None).cast("map<string,binary>").alias("headers"),
    )
    wm = log.append_raw("t", rows)
    assert wm[1] == 4  # not silently dropped
    assert wm[0] == 0


def test_append_raw_rejects_out_of_range_partition(spark, log):
    log.create_topic("t", 2)
    rows = spark.range(1).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.lit(5).cast("int").alias("partition"),
        F.col("id").cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.lit(None).cast("map<string,binary>").alias("headers"),
    )
    with pytest.raises(ValueError, match="partition"):
        log.append_raw("t", rows)


# ------------------------------------------------------ compaction crash


def test_compact_swap_recovers_from_crash_window(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _records(spark, 20), order_by=["seq"])
    n_before = log.scan("t").count()
    tdir = log._topic_dir("t")
    # simulate a crash between the two renames: data/ moved aside,
    # replacement never landed
    os.rename(os.path.join(tdir, "data"), os.path.join(tdir, "data.old-deadbeef"))
    assert log.scan("t").count() == n_before  # recovered transparently
    assert not os.path.isdir(os.path.join(tdir, "data.old-deadbeef"))


def test_compact_still_correct_after_fix(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _records(spark, 50), order_by=["seq"])
    n = log.compact("t")
    assert n == 7  # 7 distinct keys, all non-null
    assert log.scan("t").count() == 7
    tdir = log._topic_dir("t")
    assert [d for d in os.listdir(tdir) if d.startswith("data.old-")] == []


# ------------------------------------------------------ commit sequencing


def test_commit_seq_orders_rapid_commits(spark, log):
    log.create_topic("t", 1)
    for off in [5, 9, 3]:  # last writer wins even within one tick
        log.commit_offset("g", "t", 0, off)
    got = {r.partition: r.committed_offset for r in log.fetch_offsets("g").collect()}
    assert got == {0: 3}


def test_commit_seq_survives_new_instance(spark, log):
    # a "rebooted" TopicLog (fresh process analog) must supersede
    # commits from the previous instance — wall clock, not monotonic
    log.create_topic("t", 1)
    log.commit_offset("g", "t", 0, 100)
    reborn = TopicLog(spark, log.root)
    reborn.commit_offset("g", "t", 0, 7)
    got = {r.partition: r.committed_offset for r in reborn.fetch_offsets("g").collect()}
    assert got == {0: 7}

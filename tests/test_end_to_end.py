"""Whole-engine flow: Kafka wire bytes in → broker log → flush to the
parquet topic log → Structured Streaming windowed analytics out.

This is the engine's reason to exist in one test: the protocol plane
accepts standard Kafka record batches, the data plane makes them a
queryable, streamable table.
"""

from __future__ import annotations

import json
import struct
import tempfile
import uuid

from pyspark.sql import functions as F

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import WireLog, decode_produce_response, handle_produce
from kcore_spark.protocol.records import Record, encode_record_batch
from kcore_spark.sources.topic_log import TopicLog


def _produce_frame(topic, partition, batch, corr=1):
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(3).int32(corr)
    w.nullable_string("e2e")
    w.nullable_string(None)
    w.int16(-1).int32(30000)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition)
    w.nullable_bytes(batch)
    return w.bytes()


def test_wire_to_streaming_analytics(spark):
    base_ts = 1_700_000_000_000
    wl = WireLog()
    wl.create_topic("clicks", 2)

    # 1. producer clients send 3 record batches over the wire protocol
    for batch_no in range(3):
        for partition in range(2):
            records = [
                Record(
                    key=f"user-{(batch_no * 7 + i) % 5}".encode(),
                    value=json.dumps(
                        {"amount": batch_no * 10 + i, "minute": batch_no}
                    ).encode(),
                    timestamp_ms=base_ts + batch_no * 60_000 + i * 1000,
                )
                for i in range(10)
            ]
            resp = handle_produce(
                wl, _produce_frame("clicks", partition, encode_record_batch(records))
            )
            _, results, _ = decode_produce_response(resp)
            assert results[0][1][0][1] == wire.ERR_NONE
            assert results[0][1][0][2] == batch_no * 10  # dense base offsets

    # 2. broker flushes to the durable parquet topic log
    root = tempfile.mkdtemp(prefix="kcore_e2e_")
    tlog = TopicLog(spark, root)
    tlog.create_topic("clicks", 2)
    assert wl.flush_to_topic_log(spark, tlog, "clicks") == 60

    # 3. batch analytics over the topic: per-user totals via JSON decode
    scan = tlog.scan("clicks").select(
        F.decode("key", "utf-8").alias("user"),
        F.get_json_object(F.decode("value", "utf-8"), "$.amount").cast("long").alias("amount"),
        "timestamp",
        "partition",
        "offset",
    )
    per_user = {r["user"]: r["total"] for r in
                scan.groupBy("user").agg(F.sum("amount").alias("total")).collect()}
    assert set(per_user) == {f"user-{i}" for i in range(5)}
    assert sum(per_user.values()) == 2 * sum(b * 10 + i for b in range(3) for i in range(10))

    # 4. the same topic as a STREAM: tumbling 1-minute windows
    name = f"e2e_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="kcore_e2e_ckpt_")
    agg = (
        tlog.read_stream("clicks")
        .withWatermark("timestamp", "10 minutes")
        .groupBy(F.window("timestamp", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    windows = {
        r["w"]["start"].minute: r["n"] for r in spark.table(name).collect()
    }
    # 3 one-minute windows, 20 events each (2 partitions × 10)
    assert windows == {13: 20, 14: 20, 15: 20}

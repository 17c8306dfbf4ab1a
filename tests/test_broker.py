"""Produce/Fetch data plane: record-batch v2 codec round-trips, CRC
integrity, wire produce→fetch over a real socket, and the flush
bridge into the parquet topic log."""

from __future__ import annotations

import asyncio
import struct

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    WireLog,
    decode_fetch_response,
    decode_produce_response,
    handle_fetch,
    handle_produce,
)
from kcore_spark.protocol.records import (
    Record,
    crc32c,
    decode_all_batches,
    decode_record_batch,
    decode_varint,
    encode_record_batch,
    encode_varint,
)
from kcore_spark.protocol.server import KafkaFrontend

# ------------------------------------------------------ codec


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros → 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_varint_zigzag_roundtrip():
    for v in [0, -1, 1, -2, 63, -64, 64, 300, -300, 2**31, -(2**31), 2**62]:
        dec, pos = decode_varint(encode_varint(v), 0)
        assert dec == v


def _sample_records():
    return [
        Record(b"k1", b"v1", 1700000000000, headers=[("h", b"x"), ("empty", None)]),
        Record(None, b"v2", 1700000000123),
        Record(b"k3", None, 1700000001000),
    ]


def test_record_batch_roundtrip():
    batch = encode_record_batch(_sample_records(), base_offset=42)
    base, recs, end = decode_record_batch(batch)
    assert base == 42
    assert end == len(batch)
    assert [r.offset for r in recs] == [42, 43, 44]
    assert recs[0].key == b"k1" and recs[0].value == b"v1"
    assert recs[0].headers == [("h", b"x"), ("empty", None)]
    assert recs[1].key is None and recs[1].value == b"v2"
    assert recs[2].value is None
    assert [r.timestamp_ms for r in recs] == [1700000000000, 1700000000123, 1700000001000]


def test_record_batch_crc_rejects_corruption():
    batch = bytearray(encode_record_batch(_sample_records()))
    batch[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batch(bytes(batch))


# ------------------------------------------------------ produce/fetch handlers


def _produce_payload(topic: str, partition: int, batch: bytes, corr=9, version=3) -> bytes:
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(version).int32(corr)
    w.nullable_string("t")  # client_id
    w.nullable_string(None)  # transactional_id
    w.int16(-1)  # acks
    w.int32(30000)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition)
    w.nullable_bytes(batch)
    return w.bytes()


def _fetch_payload(topic: str, partition: int, offset: int, corr=11) -> bytes:
    w = wire.Writer()
    w.int16(wire.FETCH_KEY).int16(4).int32(corr)
    w.nullable_string("t")
    w.int32(-1)  # replica_id
    w.int32(100).int32(1).int32(1 << 20)
    w.int8(0)  # isolation
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition).int64(offset).int32(1 << 20)
    return w.bytes()


def test_produce_then_fetch_roundtrip():
    log = WireLog()
    log.create_topic("t", 2)
    resp = handle_produce(log, _produce_payload("t", 0, encode_record_batch(_sample_records())))
    corr, results, _ = decode_produce_response(resp)
    assert corr == 9
    assert results == [("t", [(0, wire.ERR_NONE, 0, -1)])]
    # second batch appends at offset 3
    resp = handle_produce(log, _produce_payload("t", 0, encode_record_batch(_sample_records())))
    _, results, _ = decode_produce_response(resp)
    assert results[0][1][0][2] == 3

    fr = handle_fetch(log, _fetch_payload("t", 0, 2))
    corr, out = decode_fetch_response(fr)
    assert corr == 11
    (name, [(idx, err, hw, batch)]) = out[0]
    assert (name, idx, err, hw) == ("t", 0, wire.ERR_NONE, 6)
    recs = decode_all_batches(batch)
    assert [r.offset for r in recs] == [2, 3, 4, 5]
    assert recs[0].value is None  # third sample record
    assert recs[1].value == b"v1"


def test_produce_unknown_topic_and_corrupt_batch():
    log = WireLog()
    log.create_topic("t", 1)
    resp = handle_produce(log, _produce_payload("nope", 0, encode_record_batch(_sample_records())))
    _, results, _ = decode_produce_response(resp)
    assert results[0][1][0][1] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    bad = bytearray(encode_record_batch(_sample_records()))
    bad[20] ^= 0xFF
    resp = handle_produce(log, _produce_payload("t", 0, bytes(bad)))
    _, results, _ = decode_produce_response(resp)
    assert results[0][1][0][1] == wire.ERR_CORRUPT_MESSAGE
    assert log.high_watermark("t", 0) == 0  # nothing appended


def test_fetch_out_of_range():
    log = WireLog()
    log.create_topic("t", 1)
    log.append("t", 0, _sample_records())
    fr = handle_fetch(log, _fetch_payload("t", 0, 99))
    _, out = decode_fetch_response(fr)
    assert out[0][1][0][1] == wire.ERR_OFFSET_OUT_OF_RANGE


# ------------------------------------------------------ over the socket


def test_socket_produce_fetch_end_to_end():
    async def run():
        fe = KafkaFrontend(port=0)
        fe.wire_log.create_topic("events", 1)
        await fe.start()
        try:
            reader, writer = await asyncio.open_connection(fe.host, fe.port)

            async def rpc(frame: bytes) -> bytes:
                writer.write(struct.pack(">I", len(frame)) + frame)
                await writer.drain()
                (size,) = struct.unpack(">I", await reader.readexactly(4))
                return await reader.readexactly(size)

            p = await rpc(_produce_payload("events", 0, encode_record_batch(_sample_records())))
            _, results, _ = decode_produce_response(p)
            assert results[0][1][0][1] == wire.ERR_NONE
            f = await rpc(_fetch_payload("events", 0, 0))
            _, out = decode_fetch_response(f)
            recs = decode_all_batches(out[0][1][0][3])
            assert [r.key for r in recs] == [b"k1", None, b"k3"]
            writer.close()
        finally:
            await fe.stop()

    asyncio.run(run())


# ------------------------------------------------------ Spark flush bridge


def test_flush_bridge_to_parquet_log(spark, tmp_path):
    from pyspark.sql import functions as F

    from kcore_spark.sources.topic_log import TopicLog

    tlog = TopicLog(spark, str(tmp_path))
    tlog.create_topic("t", 2)
    wl = WireLog()
    wl.create_topic("t", 2)
    wl.append("t", 0, _sample_records())
    wl.append("t", 1, _sample_records()[:1])
    flushed = wl.flush_to_topic_log(spark, tlog, "t")
    assert flushed == 4
    assert wl.flush_to_topic_log(spark, tlog, "t") == 0  # idempotent

    rows = tlog.scan("t").orderBy("partition", "offset").collect()
    assert [(r["partition"], r["offset"]) for r in rows] == [(0, 0), (0, 1), (0, 2), (1, 0)]
    assert rows[0]["key"] == bytearray(b"k1") or rows[0]["key"] == b"k1"
    wm = tlog._watermarks("t")
    assert wm == {0: 3, 1: 1}
    # appends after flush continue the same offset sequence
    wl.append("t", 0, _sample_records()[:1])
    wl.flush_to_topic_log(spark, tlog, "t")
    assert tlog._watermarks("t")[0] == 4
    assert tlog.fetch("t", 0, 3, 10).select(F.col("offset")).collect()[0][0] == 3


# ------------------------------------------------------ handler properties

from hypothesis import given, settings
from hypothesis import strategies as st

_rec = st.builds(
    Record,
    key=st.one_of(st.none(), st.binary(max_size=32)),
    value=st.one_of(st.none(), st.binary(max_size=64)),
    timestamp_ms=st.integers(min_value=0, max_value=2**41),
    offset=st.just(0),
    headers=st.just([]),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_rec, min_size=1, max_size=8), st.lists(_rec, min_size=1, max_size=8))
def test_produce_fetch_handler_property(batch1, batch2):
    """Any two produced batches fetch back byte-identical with dense,
    contiguous offsets across the batches."""
    log = WireLog()
    log.create_topic("t", 1)
    for b in (batch1, batch2):
        resp = handle_produce(log, _produce_payload("t", 0, encode_record_batch(b)))
        _, results, _ = decode_produce_response(resp)
        assert results[0][1][0][1] == wire.ERR_NONE
    fr = handle_fetch(log, _fetch_payload("t", 0, 0))
    _, out = decode_fetch_response(fr)
    recs = decode_all_batches(out[0][1][0][3])
    want = batch1 + batch2
    assert [r.offset for r in recs] == list(range(len(want)))
    assert [(r.key, r.value, r.timestamp_ms) for r in recs] == [
        (w.key, w.value, w.timestamp_ms) for w in want
    ]


# ------------------------------------------------ Fetch v12 / v13


def _fetch_payload_modern(version, topic, partition, offset, corr=21):
    w = wire.Writer()
    w.int16(wire.FETCH_KEY).int16(version).int32(corr)
    w.nullable_string("t")
    w.empty_tagged_fields()  # flexible header (v12+)
    w.int32(-1)  # replica_id
    w.int32(100).int32(1).int32(1 << 20)
    w.int8(0)  # isolation
    w.int32(0).int32(0)  # session_id / epoch
    w.compact_array_len(1)
    if version >= 13:
        w.uuid(wire.topic_uuid(topic))
    else:
        w.compact_string(topic)
    w.compact_array_len(1)
    w.int32(partition)
    w.int32(-1)  # current_leader_epoch
    w.int64(offset)
    w.int64(-1)  # log_start_offset
    w.int32(1 << 20)
    w.empty_tagged_fields()  # partition
    w.empty_tagged_fields()  # topic
    w.compact_array_len(0)  # forgotten topics
    w.compact_string(None)  # rack_id
    w.empty_tagged_fields()
    return w.bytes()


@pytest.mark.parametrize("version", [12, 13])
def test_fetch_v12_v13_roundtrip(version):
    log = WireLog()
    log.create_topic("modern", 1)
    handle_produce(log, _produce_payload("modern", 0, encode_record_batch(_sample_records())))
    fr = handle_fetch(log, _fetch_payload_modern(version, "modern", 0, 0))
    corr, out = decode_fetch_response(fr, api_version=version)
    assert corr == 21
    (name, [(idx, err, hw, batch)]) = out[0]
    if version >= 13:
        assert name == wire.topic_uuid("modern")  # id-addressed echo
    else:
        assert name == "modern"
    assert (idx, err, hw) == (0, wire.ERR_NONE, 3)
    base, records, _ = decode_record_batch(batch)
    assert base == 0 and len(records) == 3


def test_fetch_v13_unknown_topic_id():
    log = WireLog()
    log.create_topic("known", 1)
    import uuid as uuid_mod

    ghost = uuid_mod.uuid4().bytes
    w = wire.Writer()
    w.int16(wire.FETCH_KEY).int16(13).int32(22)
    w.nullable_string("t")
    w.empty_tagged_fields()
    w.int32(-1)
    w.int32(100).int32(1).int32(1 << 20)
    w.int8(0)
    w.int32(0).int32(0)
    w.compact_array_len(1)
    w.uuid(ghost)
    w.compact_array_len(1)
    w.int32(0).int32(-1).int64(0).int64(-1).int32(1 << 20)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.compact_array_len(0)
    w.compact_string(None)
    w.empty_tagged_fields()
    fr = handle_fetch(log, w.bytes())
    corr, out = decode_fetch_response(fr, api_version=13)
    (tid, [(idx, err, hw, batch)]) = out[0]
    assert tid == ghost  # unresolvable id echoed back
    assert err == wire.ERR_UNKNOWN_TOPIC_ID
    assert batch is None

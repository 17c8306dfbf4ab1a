"""Newer / flexible protocol versions (VERDICT r1 #3): Metadata v0-v12
(flexible ≥9, topic filter honored), Produce v7-v9 (flexible at 9),
Fetch v5-v11 (sessionless sessions). Round-trips run through the real
dispatch path (KafkaFrontend.handle_request)."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    WireLog,
    decode_fetch_response,
    decode_produce_response,
)
from kcore_spark.protocol.records import Record, decode_record_batch, encode_record_batch
from kcore_spark.protocol.server import KafkaFrontend


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("alpha", 2)
    f.wire_log.create_topic("beta", 1)
    return f


# ------------------------------------------------------ Metadata


def _metadata_payload(version: int, topics: list[str] | None) -> bytes:
    w = wire.Writer()
    w.int16(wire.METADATA_KEY).int16(version).int32(55)
    w.nullable_string("pytest")
    flexible = wire.is_flexible_request(wire.METADATA_KEY, version)
    if flexible:
        w.empty_tagged_fields()
        if topics is None:
            w.unsigned_varint(0)  # null compact array
        else:
            w.compact_array_len(len(topics))
            for t in topics:
                if version >= 10:
                    w.uuid(b"\x00" * 16)
                w.compact_string(t)
                w.empty_tagged_fields()
        w.bool_(False)  # allow_auto_topic_creation
        if version <= 10:
            w.bool_(False)  # include_cluster_authorized_operations
        w.bool_(False)  # include_topic_authorized_operations
        w.empty_tagged_fields()
    else:
        if topics is None:
            w.int32(-1 if version >= 1 else 0)
        else:
            w.int32(len(topics))
            for t in topics:
                w.nullable_string(t)
        if version >= 4:
            w.bool_(False)
        if version >= 8:
            w.bool_(False)
            w.bool_(False)
    return w.bytes()


@pytest.mark.parametrize("version", [0, 1, 4, 8, 9, 10, 12])
def test_metadata_all_topics_roundtrip(fe, version):
    resp = fe.handle_request(_metadata_payload(version, None))
    corr, brokers, topics = wire.decode_metadata_response(resp, version)
    assert corr == 55
    assert brokers == [(0, fe.host, fe.port)]
    got = {name: len(parts) for err, name, tid, parts in topics if err == 0}
    assert got == {"alpha": 2, "beta": 1}


@pytest.mark.parametrize("version", [1, 9, 12])
def test_metadata_topic_filter(fe, version):
    resp = fe.handle_request(_metadata_payload(version, ["beta", "nope"]))
    _, _, topics = wire.decode_metadata_response(resp, version)
    by_name = {name: err for err, name, tid, parts in topics}
    assert by_name["beta"] == wire.ERR_NONE
    assert by_name["nope"] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION


def test_metadata_topic_id_deterministic(fe):
    r1 = fe.handle_request(_metadata_payload(10, ["alpha"]))
    r2 = fe.handle_request(_metadata_payload(12, ["alpha"]))
    _, _, t1 = wire.decode_metadata_response(r1, 10)
    _, _, t2 = wire.decode_metadata_response(r2, 12)
    tid1 = [tid for _, n, tid, _ in t1 if n == "alpha"][0]
    tid2 = [tid for _, n, tid, _ in t2 if n == "alpha"][0]
    assert tid1 == tid2 and len(tid1) == 16
    assert tid1[6] >> 4 == 3  # RFC 4122 version-3 name-based uuid


# ------------------------------------------------------ Produce v7-v9


def _produce_payload(version: int, topic: str, partition: int, batch: bytes) -> bytes:
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(version).int32(77)
    w.nullable_string("pytest")
    if wire.is_flexible_request(wire.PRODUCE_KEY, version):
        w.empty_tagged_fields()
        w.compact_string(None)  # transactional_id
        w.int16(-1).int32(30000)
        w.compact_array_len(1)
        w.compact_string(topic)
        w.compact_array_len(1)
        w.int32(partition)
        w.compact_bytes(batch)
        w.empty_tagged_fields()
        w.empty_tagged_fields()
        w.empty_tagged_fields()
    else:
        w.nullable_string(None)
        w.int16(-1).int32(30000)
        w.int32(1)
        w.nullable_string(topic)
        w.int32(1)
        w.int32(partition)
        w.nullable_bytes(batch)
    return w.bytes()


@pytest.mark.parametrize("version", [7, 8, 9, 10, 11])
def test_produce_new_versions_roundtrip(fe, version):
    batch = encode_record_batch([Record(b"k", b"v", 1700000000000)])
    resp = fe.handle_request(_produce_payload(version, "alpha", 1, batch))
    corr, results, throttle = decode_produce_response(resp, api_version=version)
    assert corr == 77 and throttle == 0
    [(name, [row])] = results
    assert name == "alpha" and row[1] == wire.ERR_NONE and row[2] == 0
    assert fe.wire_log.high_watermark("alpha", 1) == 1


# ------------------------------------------------------ Fetch v5-v11


def _fetch_payload(version: int, topic: str, partition: int, offset: int) -> bytes:
    w = wire.Writer()
    w.int16(wire.FETCH_KEY).int16(version).int32(88)
    w.nullable_string("pytest")
    w.int32(-1)  # replica_id
    w.int32(100).int32(1).int32(1 << 20)
    w.int8(0)  # isolation
    if version >= 7:
        w.int32(0).int32(-1)  # session_id, epoch
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition)
    if version >= 9:
        w.int32(-1)  # current_leader_epoch
    w.int64(offset)
    if version >= 5:
        w.int64(-1)  # log_start_offset
    w.int32(1 << 20)
    if version >= 7:
        w.int32(0)  # forgotten_topics_data: empty
    if version >= 11:
        w.nullable_string("rack-a")
    return w.bytes()


@pytest.mark.parametrize("version", [4, 5, 7, 9, 11])
def test_fetch_new_versions_roundtrip(fe, version):
    recs = [Record(b"k", b"hello", 1700000000000), Record(None, b"world", 1700000000001)]
    fe.wire_log.append("alpha", 0, recs)
    resp = fe.handle_request(_fetch_payload(version, "alpha", 0, 0))
    corr, results = decode_fetch_response(resp, api_version=version)
    assert corr == 88
    [(name, [(idx, err, hw, batch)])] = results
    assert name == "alpha" and idx == 0 and err == wire.ERR_NONE and hw == 2
    _, got, _ = decode_record_batch(batch)
    assert [r.value for r in got] == [b"hello", b"world"]


# ------------------------------------------------------ negotiation


def test_api_versions_advertises_new_ranges():
    fe = KafkaFrontend()
    w = wire.Writer()
    w.int16(wire.API_VERSIONS_KEY).int16(0).int32(1)
    w.nullable_string("c")
    resp = fe.handle_request(w.bytes())
    _, err, apis, _ = wire.decode_api_versions_response(resp, 0)
    ranges = {k: (lo, hi) for k, lo, hi in apis}
    assert ranges[wire.PRODUCE_KEY] == (3, 11)
    assert ranges[wire.FETCH_KEY] == (4, 13)
    assert ranges[wire.METADATA_KEY] == (0, 12)

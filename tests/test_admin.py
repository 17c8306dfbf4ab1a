"""Topic-management wire APIs + property-based codec tests (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.protocol import wire
from kcore_spark.protocol.records import (
    Record,
    decode_record_batch,
    decode_varint,
    encode_record_batch,
    encode_varint,
)
from kcore_spark.protocol.server import KafkaFrontend


def _create_payload(topics: list[tuple[str, int]], corr=41) -> bytes:
    w = wire.Writer()
    w.int16(wire.CREATE_TOPICS_KEY).int16(0).int32(corr)
    w.nullable_string("c")
    w.int32(len(topics))
    for name, parts in topics:
        w.nullable_string(name)
        w.int32(parts)
        w.int16(1)  # replication
        w.int32(0)  # assignments
        w.int32(0)  # configs
    w.int32(30000)
    return w.bytes()


def _delete_payload(names: list[str], corr=42) -> bytes:
    w = wire.Writer()
    w.int16(wire.DELETE_TOPICS_KEY).int16(0).int32(corr)
    w.nullable_string("c")
    w.int32(len(names))
    for n in names:
        w.nullable_string(n)
    w.int32(30000)
    return w.bytes()


def _list_offsets_payload(topic: str, partition: int, ts: int, corr=43) -> bytes:
    w = wire.Writer()
    w.int16(wire.LIST_OFFSETS_KEY).int16(1).int32(corr)
    w.nullable_string("c")
    w.int32(-1)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition).int64(ts)
    return w.bytes()


def _topic_errors(resp: bytes) -> dict[str, int]:
    r = wire.Reader(resp)
    r.int32()
    return {r.nullable_string(): r.int16() for _ in range(r.int32())}


def test_create_delete_lifecycle():
    fe = KafkaFrontend()
    assert _topic_errors(fe.handle_request(_create_payload([("a", 3), ("b", 1)]))) == {
        "a": 0,
        "b": 0,
    }
    # duplicate + invalid partitions
    errs = _topic_errors(fe.handle_request(_create_payload([("a", 2), ("c", 0)])))
    assert errs == {"a": 36, "c": 37}
    assert fe.wire_log.topics == {"a": 3, "b": 1}
    # delete one, delete unknown
    errs = _topic_errors(fe.handle_request(_delete_payload(["a", "zz"])))
    assert errs == {"a": 0, "zz": 3}
    assert fe.wire_log.topics == {"b": 1}
    assert not fe.wire_log.has("a", 0)


def test_list_offsets_earliest_latest():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    fe.wire_log.append("t", 0, [Record(b"k", b"v", 1) for _ in range(5)])

    def last_offset(resp):
        r = wire.Reader(resp)
        r.int32(), r.int32(), r.nullable_string(), r.int32()
        r.int32()  # partition
        err = r.int16()
        r.int64()  # ts
        return err, r.int64()

    assert last_offset(fe.handle_request(_list_offsets_payload("t", 0, -2))) == (0, 0)
    assert last_offset(fe.handle_request(_list_offsets_payload("t", 0, -1))) == (0, 5)
    err, _ = last_offset(fe.handle_request(_list_offsets_payload("t", 9, -1)))
    assert err == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION


def test_list_offsets_by_timestamp():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    fe.wire_log.append("t", 0, [Record(b"k", b"v", ts) for ts in (100, 200, 200, 300)])

    def ts_offset(resp):
        r = wire.Reader(resp)
        r.int32(), r.int32(), r.nullable_string(), r.int32()
        r.int32()  # partition
        err = r.int16()
        return err, r.int64(), r.int64()  # err, matched ts, offset

    # exact hit → first of the tied records
    assert ts_offset(fe.handle_request(_list_offsets_payload("t", 0, 200))) == (0, 200, 1)
    # between records → next one
    assert ts_offset(fe.handle_request(_list_offsets_payload("t", 0, 201))) == (0, 300, 3)
    # before all → offset 0; after all → -1/-1 (Kafka's "no such offset")
    assert ts_offset(fe.handle_request(_list_offsets_payload("t", 0, 1))) == (0, 100, 0)
    assert ts_offset(fe.handle_request(_list_offsets_payload("t", 0, 9999))) == (0, -1, -1)


# ------------------------------------------------------ property tests


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_varint_roundtrip_property(v):
    dec, _ = decode_varint(encode_varint(v), 0)
    assert dec == v


record_st = st.builds(
    Record,
    key=st.one_of(st.none(), st.binary(max_size=64)),
    value=st.one_of(st.none(), st.binary(max_size=256)),
    timestamp_ms=st.integers(min_value=0, max_value=2**42),
    offset=st.just(0),
    headers=st.lists(
        st.tuples(st.text(max_size=16), st.one_of(st.none(), st.binary(max_size=32))),
        max_size=4,
    ),
)


@settings(max_examples=50, deadline=None)
@given(st.lists(record_st, min_size=1, max_size=20), st.integers(min_value=0, max_value=2**40))
def test_record_batch_roundtrip_property(records, base):
    batch = encode_record_batch(records, base_offset=base)
    got_base, got, end = decode_record_batch(batch)
    assert got_base == base
    assert end == len(batch)
    assert [r.offset for r in got] == [base + i for i in range(len(records))]
    for orig, dec in zip(records, got):
        assert dec.key == orig.key
        assert dec.value == orig.value
        assert dec.timestamp_ms == orig.timestamp_ms
        assert dec.headers == orig.headers


def test_gzip_record_batch_roundtrip():
    recs = [Record(b"k%d" % i, b"v" * 100, 1000 + i) for i in range(50)]
    plain = encode_record_batch(recs, base_offset=7)
    gz = encode_record_batch(recs, base_offset=7, compression="gzip")
    assert len(gz) < len(plain)  # 100-byte repeated values compress
    base, got, end = decode_record_batch(gz)
    assert base == 7 and end == len(gz)
    assert [(r.key, r.value, r.timestamp_ms, r.offset) for r in got] == [
        (r.key, b"v" * 100, 1000 + i, 7 + i) for i, r in enumerate(recs)
    ]


def _list_offsets_payload_v(version: int, topic: str, partition: int, ts: int, max_n=3, corr=47):
    w = wire.Writer()
    w.int16(wire.LIST_OFFSETS_KEY).int16(version).int32(corr)
    w.nullable_string("c")
    w.int32(-1)  # replica_id
    if version >= 2:
        w.int8(0)  # isolation_level
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition)
    if version >= 4:
        w.int32(-1)  # current_leader_epoch
    w.int64(ts)
    if version == 0:
        w.int32(max_n)
    return w.bytes()


@pytest.mark.parametrize("version", [0, 1, 2, 3, 4, 5])
def test_list_offsets_all_versions(version):
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    fe.wire_log.append("t", 0, [Record(b"k", b"v", 100 + i) for i in range(5)])
    resp = fe.handle_request(_list_offsets_payload_v(version, "t", 0, -1))
    r = wire.Reader(resp)
    assert r.int32() == 47
    if version >= 2:
        assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.nullable_string() == "t"
    assert r.int32() == 1
    assert r.int32() == 0  # partition
    assert r.int16() == wire.ERR_NONE
    if version == 0:
        n = r.int32()
        assert n == 1 and r.int64() == 5  # log-end offset array
    else:
        assert r.int64() == -1  # ts
        assert r.int64() == 5
        if version >= 4:
            assert r.int32() == 0  # leader_epoch


@pytest.mark.parametrize("version", [2, 4])
def test_list_offsets_timestamp_across_versions(version):
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    fe.wire_log.append("t", 0, [Record(b"k", b"v", ts) for ts in (100, 200, 300)])
    resp = fe.handle_request(_list_offsets_payload_v(version, "t", 0, 150))
    r = wire.Reader(resp)
    r.int32(), r.int32(), r.int32(), r.nullable_string(), r.int32(), r.int32()
    assert r.int16() == wire.ERR_NONE
    assert r.int64() == 200 and r.int64() == 1


# ------------------------------------------------ OffsetDelete (k47)


def _offset_delete_payload(group: str, topics: list[tuple[str, list[int]]]) -> bytes:
    w = wire.Writer()
    w.int16(wire.OFFSET_DELETE_KEY).int16(0).int32(71)
    w.nullable_string("pytest")
    w.nullable_string(group)
    w.int32(len(topics))
    for name, parts in topics:
        w.nullable_string(name)
        w.int32(len(parts))
        for p in parts:
            w.int32(p)
    return w.bytes()


def _parse_offset_delete(resp: bytes):
    r = wire.Reader(resp)
    corr, err, _throttle = r.int32(), r.int16(), r.int32()
    out = {}
    for _ in range(r.int32()):
        name = r.nullable_string()
        for _ in range(r.int32()):
            p, perr = r.int32(), r.int16()
            out[(name, p)] = perr
    return corr, err, out


def test_offset_delete_removes_commits_and_flags_unknown():
    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend()
    fe.group_store.commit("g1", "t", 0, 42)
    fe.group_store.commit("g1", "t", 1, 7)
    resp = fe.handle_request(
        _offset_delete_payload("g1", [("t", [0, 5])])
    )
    corr, err, parts = _parse_offset_delete(resp)
    assert corr == 71 and err == wire.ERR_NONE
    assert parts[("t", 0)] == wire.ERR_NONE
    assert parts[("t", 5)] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    # deleted commit is gone; untouched partition survives
    assert fe.group_store.fetch("g1", "t", 0) == -1
    assert fe.group_store.fetch("g1", "t", 1) == 7


def test_offset_delete_unknown_group():
    from kcore_spark.protocol.groups import ERR_GROUP_ID_NOT_FOUND
    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend()
    _, err, parts = _parse_offset_delete(
        fe.handle_request(_offset_delete_payload("ghost", [("t", [0])]))
    )
    assert err == ERR_GROUP_ID_NOT_FOUND
    assert parts[("t", 0)] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION


# ------------------------------------------------ DescribeCluster (k60)


def test_describe_cluster_v0():
    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend(host="127.0.0.1", port=9092)
    w = wire.Writer()
    w.int16(wire.DESCRIBE_CLUSTER_KEY).int16(0).int32(81)
    w.nullable_string("pytest")
    w.empty_tagged_fields()  # flexible header
    w.bool_(False)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 81
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None  # error_message
    assert r.compact_string() == "kcore-spark"
    assert r.int32() == 0  # controller
    assert r.compact_array_len() == 1
    assert r.int32() == 0  # broker id
    assert r.compact_string() == "127.0.0.1"
    assert r.int32() == 9092
    assert r.compact_string() is None  # rack
    r.tagged_fields()
    assert r.int32() == -2147483648


def test_describe_cluster_v1_endpoint_type():
    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend(host="127.0.0.1", port=9092)

    def req(endpoint_type, corr):
        w = wire.Writer()
        w.int16(wire.DESCRIBE_CLUSTER_KEY).int16(1).int32(corr)
        w.nullable_string("pytest")
        w.empty_tagged_fields()
        w.bool_(False)
        w.int8(endpoint_type)
        w.empty_tagged_fields()
        return wire.Reader(fe.handle_request(w.bytes()))

    # broker endpoint (type 1): full answer, endpoint_type echoed
    r = req(1, 82)
    assert r.int32() == 82
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None
    assert r.int8() == 1  # endpoint_type
    assert r.compact_string() == "kcore-spark"
    assert r.int32() == 0
    assert r.compact_array_len() == 1

    # controller endpoint (type 2) on a broker: MISMATCHED_ENDPOINT_TYPE
    from kcore_spark.protocol.admin import ERR_MISMATCHED_ENDPOINT_TYPE

    r = req(2, 83)
    assert r.int32() == 83
    r.tagged_fields()
    r.int32()
    assert r.int16() == ERR_MISMATCHED_ENDPOINT_TYPE
    assert r.compact_string()  # error message present
    assert r.int8() == 1  # we still say what we are
    assert r.compact_string() == "kcore-spark"
    r.int32()
    assert r.compact_array_len() == 0  # brokers withheld

    ranges = {k: (lo, hi) for k, lo, hi in wire.SUPPORTED_APIS}
    assert ranges[wire.DESCRIBE_CLUSTER_KEY] == (0, 1)


# ------------------------------------------------ ListOffsets v6/v7


def _list_offsets_modern(version, topic, partition, ts, corr=95):
    w = wire.Writer()
    w.int16(wire.LIST_OFFSETS_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.empty_tagged_fields()  # flexible header (v6+)
    w.int32(-1)  # replica_id
    w.int8(0)  # isolation_level
    w.compact_array_len(1)
    w.compact_string(topic)
    w.compact_array_len(1)
    w.int32(partition).int32(-1).int64(ts)
    w.empty_tagged_fields()  # partition
    w.empty_tagged_fields()  # topic
    w.empty_tagged_fields()  # body
    return w.bytes()


def _parse_list_offsets_modern(resp):
    r = wire.Reader(resp)
    corr = r.int32()
    r.tagged_fields()
    r.int32()  # throttle
    assert r.compact_array_len() == 1
    name = r.compact_string()
    assert r.compact_array_len() == 1
    p = r.int32()
    err = r.int16()
    ts = r.int64()
    off = r.int64()
    r.int32()  # leader_epoch
    return corr, name, p, err, ts, off


def _txn_free_log_with_records():
    from kcore_spark.protocol.broker import WireLog
    from kcore_spark.protocol.records import Record
    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend()
    fe.wire_log.create_topic("lo", 1)
    fe.wire_log.append(
        "lo",
        0,
        [
            Record(b"a", b"1", 1000),
            Record(b"b", b"2", 5000),  # the max-timestamp record
            Record(b"c", b"3", 3000),
        ],
    )
    return fe


def test_list_offsets_v6_flexible_latest():
    fe = _txn_free_log_with_records()
    corr, name, p, err, ts, off = _parse_list_offsets_modern(
        fe.handle_request(_list_offsets_modern(6, "lo", 0, -1))
    )
    assert (corr, name, p, err) == (95, "lo", 0, wire.ERR_NONE)
    assert off == 3  # log-end offset


def test_list_offsets_v7_max_timestamp():
    fe = _txn_free_log_with_records()
    corr, name, p, err, ts, off = _parse_list_offsets_modern(
        fe.handle_request(_list_offsets_modern(7, "lo", 0, -3))
    )
    assert err == wire.ERR_NONE
    assert ts == 5000 and off == 1  # the record with the highest timestamp


def test_list_offsets_v7_max_timestamp_tie_keeps_earliest():
    """Kafka's UnifiedLog only advances maxTimestampSoFar on a STRICTLY
    greater timestamp, so among equal max timestamps the FIRST record's
    offset wins."""
    from kcore_spark.protocol.records import Record
    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend()
    fe.wire_log.create_topic("lo", 1)
    fe.wire_log.append(
        "lo",
        0,
        [Record(b"a", b"1", 1000), Record(b"b", b"2", 5000), Record(b"c", b"3", 5000)],
    )
    _, _, _, err, ts, off = _parse_list_offsets_modern(
        fe.handle_request(_list_offsets_modern(7, "lo", 0, -3))
    )
    assert err == wire.ERR_NONE
    assert ts == 5000 and off == 1  # not 2: ties keep the earliest offset

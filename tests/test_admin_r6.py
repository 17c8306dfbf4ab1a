"""Round-6 admin APIs: CreatePartitions (37), DescribeLogDirs (35),
GetTelemetrySubscriptions (71, KIP-714)."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.records import Record
from kcore_spark.protocol.server import KafkaFrontend


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("alpha", 2)
    return f


def _create_partitions(fe, topics, version=0, validate_only=False, corr=30):
    flex = version >= 2
    w = wire.Writer()
    w.int16(wire.CREATE_PARTITIONS_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
    wstr = w.compact_string if flex else w.nullable_string
    wlen = w.compact_array_len if flex else w.int32
    wlen(len(topics))
    for name, count in topics:
        wstr(name)
        w.int32(count)
        wlen(-1) if not flex else w.compact_array_len(-1)  # null assignments
        if flex:
            w.empty_tagged_fields()
    w.int32(30000)  # timeout
    w.bool_(validate_only)
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    if flex:
        r.tagged_fields()
    r.int32()  # throttle
    rlen = r.compact_array_len if flex else r.int32
    rstr = r.compact_string if flex else r.nullable_string
    out = {}
    for _ in range(max(rlen(), 0)):
        name = rstr()
        err = r.int16()
        msg = rstr()
        out[name] = (err, msg)
        if flex:
            r.tagged_fields()
    return out


@pytest.mark.parametrize("version", [0, 2, 3])
def test_create_partitions_grows_topic(fe, version):
    out = _create_partitions(fe, [("alpha", 5)], version=version)
    assert out["alpha"][0] == wire.ERR_NONE
    assert fe.wire_log.topics["alpha"] == 5
    assert fe.wire_log.has("alpha", 4)
    # appends to the new partition work
    assert fe.wire_log.append("alpha", 4, [Record(b"k", b"v", 1)]) == 0


def test_create_partitions_rejects_shrink_and_unknown(fe):
    out = _create_partitions(fe, [("alpha", 2), ("alpha", 1), ("ghost", 4)])
    # first entry: 2 <= current 2 → INVALID_PARTITIONS
    assert out["alpha"][0] == 37
    assert out["ghost"][0] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    assert fe.wire_log.topics["alpha"] == 2


def test_create_partitions_validate_only_mutates_nothing(fe):
    out = _create_partitions(fe, [("alpha", 8)], validate_only=True)
    assert out["alpha"][0] == wire.ERR_NONE
    assert fe.wire_log.topics["alpha"] == 2
    assert not fe.wire_log.has("alpha", 5)


def _describe_log_dirs(fe, topics, version=0, corr=31):
    flex = version >= 2
    w = wire.Writer()
    w.int16(wire.DESCRIBE_LOG_DIRS_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
    wstr = w.compact_string if flex else w.nullable_string
    wlen = w.compact_array_len if flex else w.int32
    if topics is None:
        wlen(-1)
    else:
        wlen(len(topics))
        for name, parts in topics:
            wstr(name)
            wlen(len(parts))
            for p in parts:
                w.int32(p)
            if flex:
                w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    if flex:
        r.tagged_fields()
    r.int32()  # throttle
    rlen = r.compact_array_len if flex else r.int32
    rstr = r.compact_string if flex else r.nullable_string
    assert rlen() == 1  # one log dir
    assert r.int16() == wire.ERR_NONE
    log_dir = rstr()
    sizes = {}
    for _ in range(max(rlen(), 0)):
        name = rstr()
        for _ in range(max(rlen(), 0)):
            p = r.int32()
            size = r.int64()
            r.int64()  # offset_lag
            r.bool_()  # is_future_key
            sizes[(name, p)] = size
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()
    return log_dir, sizes


@pytest.mark.parametrize("version", [0, 2])
def test_describe_log_dirs_reports_sizes(fe, version):
    fe.wire_log.append("alpha", 0, [Record(b"key1", b"x" * 100, 1)])
    fe.wire_log.append("alpha", 1, [Record(None, b"y" * 10, 2)])
    log_dir, sizes = _describe_log_dirs(fe, None, version=version)  # null = all
    assert log_dir
    assert sizes[("alpha", 0)] == 104
    assert sizes[("alpha", 1)] == 10
    # explicit selection narrows the report
    _, sel = _describe_log_dirs(fe, [("alpha", [0])], version=version)
    assert list(sel) == [("alpha", 0)]


def test_telemetry_subscriptions_empty_but_valid(fe):
    w = wire.Writer()
    w.int16(wire.GET_TELEMETRY_SUBSCRIPTIONS_KEY).int16(0).int32(77)
    w.nullable_string("librdkafka")
    w.empty_tagged_fields()
    w.uuid(b"\x00" * 16)  # ask the broker to assign an instance id
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    r.tagged_fields()
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    cid = r.uuid()
    assert cid != b"\x00" * 16  # broker assigned one
    r.int32()  # subscription_id
    assert r.compact_array_len() == 0  # no compression types
    assert r.int32() > 0  # push interval
    assert r.int32() > 0  # max bytes
    r.bool_()
    assert r.compact_array_len() == 0  # no metrics requested
    r.tagged_fields()
    assert r.pos == len(r.buf)


def test_apiversions_advertises_r6_admin_keys():
    advertised = {k: (lo, hi) for k, lo, hi in wire.SUPPORTED_APIS}
    assert advertised[wire.CREATE_PARTITIONS_KEY] == (0, 3)
    assert advertised[wire.DESCRIBE_LOG_DIRS_KEY] == (0, 2)
    assert advertised[wire.GET_TELEMETRY_SUBSCRIPTIONS_KEY] == (0, 0)

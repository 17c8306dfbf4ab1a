"""KIP-714 completion (PushTelemetry k72, ListClientMetricsResources
k74) and the paginated DescribeTopicPartitions (k75): happy paths,
the unknown-subscription error, cursor pagination across topics and
partitions, unknown-topic reporting, and push-accounting bounds."""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend

CORR = 4242


def _hdr(key: int, version: int) -> wire.Writer:
    w = wire.Writer()
    w.int16(key).int16(version).int32(CORR)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    return w


def _push(cid: bytes, sub_id: int, metrics: bytes = b"m" * 10) -> bytes:
    w = _hdr(wire.PUSH_TELEMETRY_KEY, 0)
    w.uuid(cid)
    w.int32(sub_id)
    w.bool_(False)
    w.int8(0)
    w.compact_bytes(metrics)
    w.empty_tagged_fields()
    return w.bytes()


def _parse_push(resp: bytes) -> tuple[int, int]:
    r = wire.Reader(resp)
    corr = r.int32()
    r.tagged_fields()
    r.int32()  # throttle
    return corr, r.int16()


def test_push_telemetry_accepts_broker_subscription_and_accounts():
    fe = KafkaFrontend()
    cid = b"\x07" * 16
    for _ in range(3):
        corr, err = _parse_push(fe.handle_request(_push(cid, 0)))
        assert (corr, err) == (CORR, wire.ERR_NONE)
    assert fe._telemetry_pushes[cid] == (3, 30)


def test_push_telemetry_unknown_subscription_id():
    fe = KafkaFrontend()
    corr, err = _parse_push(fe.handle_request(_push(b"\x07" * 16, 99)))
    assert (corr, err) == (CORR, 117)  # UNKNOWN_SUBSCRIPTION_ID
    assert not fe._telemetry_pushes


def test_push_accounting_is_capped():
    fe = KafkaFrontend()
    fe._telemetry_pushes = {bytes([i % 256, i // 256]) + b"\x00" * 14: (1, 1) for i in range(1024)}
    corr, err = _parse_push(fe.handle_request(_push(b"\xaa" * 16, 0)))
    assert err == wire.ERR_NONE  # still accepted on the wire
    assert b"\xaa" * 16 not in fe._telemetry_pushes  # but not tracked
    assert len(fe._telemetry_pushes) == 1024


def test_list_client_metrics_resources_empty():
    fe = KafkaFrontend()
    w = _hdr(wire.LIST_CLIENT_METRICS_RESOURCES_KEY, 0)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == CORR
    r.tagged_fields()
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_array_len() == 0


# ------------------------------------------- DescribeTopicPartitions


def _dtp(names: list[str], limit: int = 100, cursor=None) -> bytes:
    w = _hdr(wire.DESCRIBE_TOPIC_PARTITIONS_KEY, 0)
    w.compact_array_len(len(names))
    for n in names:
        w.compact_string(n)
        w.empty_tagged_fields()
    w.int32(limit)
    if cursor is None:
        w.int8(-1)
    else:
        w.int8(1)
        w.compact_string(cursor[0])
        w.int32(cursor[1])
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _parse_dtp(resp: bytes):
    r = wire.Reader(resp)
    assert r.int32() == CORR
    r.tagged_fields()
    r.int32()  # throttle
    topics = {}
    for _ in range(r.compact_array_len()):
        err = r.int16()
        name = r.compact_string()
        tid = r.uuid()
        r.bool_()  # is_internal
        parts = []
        for _ in range(r.compact_array_len()):
            perr = r.int16()
            pidx = r.int32()
            r.int32()  # leader_id
            r.int32()  # leader_epoch
            replicas = [r.int32() for _ in range(r.compact_array_len())]
            isr = [r.int32() for _ in range(r.compact_array_len())]
            for _ in range(r.compact_array_len()):
                r.int32()  # elr
            for _ in range(r.compact_array_len()):
                r.int32()  # last_known_elr
            for _ in range(r.compact_array_len()):
                r.int32()  # offline
            r.tagged_fields()
            parts.append((perr, pidx, replicas, isr))
        r.int32()  # topic_authorized_operations
        r.tagged_fields()
        topics[name] = (err, tid, parts)
    marker = r.int8()  # unsigned read: 0xff = null cursor
    cursor = None
    if marker != 0xFF:
        cursor = (r.compact_string(), r.int32())
        r.tagged_fields()
    return topics, cursor


def _fe3() -> KafkaFrontend:
    fe = KafkaFrontend()
    fe.wire_log.create_topic("alpha", 2)
    fe.wire_log.create_topic("beta", 3)
    fe.wire_log.create_topic("gamma", 1)
    return fe


def test_dtp_named_topic_full_shape():
    fe = _fe3()
    topics, cursor = _parse_dtp(fe.handle_request(_dtp(["beta"])))
    assert cursor is None
    err, tid, parts = topics["beta"]
    assert err == wire.ERR_NONE
    assert tid == wire.topic_uuid("beta")
    assert [(p[1], p[2], p[3]) for p in parts] == [(0, [0], [0]), (1, [0], [0]), (2, [0], [0])]


def test_dtp_unknown_topic_reported():
    fe = _fe3()
    topics, _ = _parse_dtp(fe.handle_request(_dtp(["nope"])))
    err, tid, parts = topics["nope"]
    assert err == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    assert tid == b"\x00" * 16 and parts == []


def test_dtp_all_topics_paginates_with_cursor():
    fe = _fe3()  # 6 partitions total across alpha(2), beta(3), gamma(1)
    seen = []
    cursor = None
    pages = 0
    while True:
        topics, cursor = _parse_dtp(fe.handle_request(_dtp([], limit=2, cursor=cursor)))
        pages += 1
        for name, (_, _, parts) in topics.items():
            seen.extend((name, p[1]) for p in parts)
        if cursor is None:
            break
        assert pages < 10
    assert pages == 3
    assert seen == [
        ("alpha", 0), ("alpha", 1),
        ("beta", 0), ("beta", 1),
        ("beta", 2), ("gamma", 0),
    ]


def test_dtp_cursor_mid_topic_resumes_exactly():
    fe = _fe3()
    topics, cursor = _parse_dtp(
        fe.handle_request(_dtp([], limit=4, cursor=("beta", 1)))
    )
    got = [(n, p[1]) for n, (_, _, ps) in sorted(topics.items()) for p in ps]
    assert got == [("beta", 1), ("beta", 2), ("gamma", 0)]
    assert cursor is None

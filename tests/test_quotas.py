"""Client quotas (k48/k49 + throttle enforcement): window math,
entity resolution, wire round-trips with spec-derived frames, and
produce/fetch responses actually carrying the computed backoff."""

from __future__ import annotations

import struct

from kcore_spark.protocol import wire
from kcore_spark.protocol.quotas import (
    MATCH_ANY,
    MATCH_DEFAULT,
    MATCH_EXACT,
    QuotaManager,
)
from kcore_spark.protocol.server import KafkaFrontend


# ---------------------------------------------------------- spec-side builder
def i8(v):
    return struct.pack(">b", v)


def i16(v):
    return struct.pack(">h", v)


def i32(v):
    return struct.pack(">i", v)


def f64(v):
    return struct.pack(">d", v)


def nstr(s):
    if s is None:
        return i16(-1)
    b = s.encode()
    return i16(len(b)) + b


def hdr1(key, ver, corr, client="cli"):
    return i16(key) + i16(ver) + i32(corr) + nstr(client)


# ------------------------------------------------------ window math


def test_quota_under_limit_no_throttle():
    qm = QuotaManager()
    qm.set_quota("user", "alice", "producer_byte_rate", 1000.0)
    assert qm.record_and_throttle("producer_byte_rate", 500, 10_000, user="alice") == 0
    assert qm.record_and_throttle("producer_byte_rate", 400, 10_100, user="alice") == 0


def test_quota_overage_throttle_formula():
    qm = QuotaManager()
    qm.set_quota("user", "alice", "producer_byte_rate", 1000.0)
    qm.record_and_throttle("producer_byte_rate", 1000, 10_000, user="alice")
    # +500 over a 1000 B/s window → 500/1000 s = 500 ms backoff
    t = qm.record_and_throttle("producer_byte_rate", 500, 10_200, user="alice")
    assert t == 500
    # a NEW window resets the accounting
    assert qm.record_and_throttle("producer_byte_rate", 100, 11_500, user="alice") == 0


def test_quota_default_vs_exact_resolution():
    qm = QuotaManager()
    qm.set_quota("user", None, "producer_byte_rate", 100.0)  # default
    qm.set_quota("user", "vip", "producer_byte_rate", 10_000.0)
    assert qm.limit_for("user", "vip", "producer_byte_rate") == 10_000.0
    assert qm.limit_for("user", "anyone", "producer_byte_rate") == 100.0
    assert qm.limit_for("client-id", "x", "producer_byte_rate") is None


def test_quota_client_id_entity_and_max_of_entities():
    qm = QuotaManager()
    qm.set_quota("client-id", "etl", "producer_byte_rate", 100.0)
    qm.set_quota("user", "alice", "producer_byte_rate", 1000.0)
    t = qm.record_and_throttle(
        "producer_byte_rate", 400, 20_000, user="alice", client_id="etl"
    )
    # 300 over the client-id quota of 100 → 3000 ms; user quota clean
    assert t == 3000


# ------------------------------------------------------ wire round-trip


def _alter_frame(entity, ops, corr=30, validate_only=False):
    out = hdr1(49, 0, corr)
    out += i32(1)  # one entry
    out += i32(len(entity))
    for etype, ename in entity:
        out += nstr(etype) + nstr(ename)
    out += i32(len(ops))
    for key, value, remove in ops:
        out += nstr(key) + f64(value) + (b"\x01" if remove else b"\x00")
    out += b"\x01" if validate_only else b"\x00"
    return out


def _describe_frame(components, corr=31):
    out = hdr1(48, 0, corr)
    out += i32(len(components))
    for etype, match_type, match in components:
        out += nstr(etype) + i8(match_type) + nstr(match)
    out += b"\x00"  # strict = false
    return out


def test_golden_alter_then_describe_quotas():
    fe = KafkaFrontend()
    r = wire.Reader(
        fe.handle_request(
            _alter_frame([("user", "alice")], [("producer_byte_rate", 2048.0, False)])
        )
    )
    assert r.int32() == 30
    assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() is None
    assert r.int32() == 1
    assert r.nullable_string() == "user" and r.nullable_string() == "alice"
    assert fe.quota_manager.limit_for("user", "alice", "producer_byte_rate") == 2048.0

    r = wire.Reader(fe.handle_request(_describe_frame([("user", MATCH_EXACT, "alice")])))
    assert r.int32() == 31
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() is None
    assert r.int32() == 1  # one entry
    assert r.int32() == 1  # one entity level
    assert r.nullable_string() == "user" and r.nullable_string() == "alice"
    assert r.int32() == 1
    assert r.nullable_string() == "producer_byte_rate"
    assert r.float64() == 2048.0


def test_describe_match_default_and_any():
    fe = KafkaFrontend()
    fe.quota_manager.set_quota("user", None, "producer_byte_rate", 64.0)
    fe.quota_manager.set_quota("user", "bob", "consumer_byte_rate", 128.0)
    # default-only match
    r = wire.Reader(fe.handle_request(_describe_frame([("user", MATCH_DEFAULT, None)])))
    r.int32(); r.int32(); r.int16(); r.nullable_string()
    assert r.int32() == 1
    r.int32()
    assert r.nullable_string() == "user" and r.nullable_string() is None
    # any-match returns both entities
    r = wire.Reader(fe.handle_request(_describe_frame([("user", MATCH_ANY, None)])))
    r.int32(); r.int32(); r.int16(); r.nullable_string()
    assert r.int32() == 2


def test_alter_rejects_unknown_key_and_validate_only():
    fe = KafkaFrontend()
    r = wire.Reader(
        fe.handle_request(
            _alter_frame([("user", "x")], [("request_percentage", 1.0, False)])
        )
    )
    r.int32(); r.int32()
    assert r.int32() == 1
    assert r.int16() == 42  # INVALID_REQUEST
    assert fe.quota_manager.quotas == {}
    # validate_only never mutates
    fe.handle_request(
        _alter_frame([("user", "x")], [("producer_byte_rate", 5.0, False)], validate_only=True)
    )
    assert fe.quota_manager.quotas == {}


# ------------------------------------------------------ enforcement e2e


def _produce_frame(topic, partition, batch, corr=1, client="etl"):
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(3).int32(corr)
    w.nullable_string(client)
    w.nullable_string(None)
    w.int16(-1).int32(30000)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition)
    w.nullable_bytes(batch)
    return w.bytes()


def test_produce_over_quota_reports_throttle():
    from kcore_spark.protocol.broker import decode_produce_response
    from kcore_spark.protocol.records import Record, encode_record_batch

    fe = KafkaFrontend()
    fe.wire_log.create_topic("q", 1)
    fe.quota_manager.set_quota("client-id", "etl", "producer_byte_rate", 50.0)
    batch = encode_record_batch([Record(key=b"k", value=b"v" * 64, timestamp_ms=1_700_000_000_000)], base_offset=0)
    # first produce blows through the 50 B/s window → nonzero throttle
    resp = fe.handle_request(_produce_frame("q", 0, batch, corr=5))
    corr, results, throttle = decode_produce_response(resp, api_version=3)
    assert corr == 5
    [(name, [(idx, err, base, _ts)])] = results
    assert err == wire.ERR_NONE  # throttled, not rejected
    assert throttle > 0
    # a client with no quota stays at 0
    fe2 = KafkaFrontend()
    fe2.wire_log.create_topic("q", 1)
    resp = fe2.handle_request(_produce_frame("q", 0, batch, corr=6))
    _, _, throttle = decode_produce_response(resp, api_version=3)
    assert throttle == 0


def test_fetch_records_response_bytes_for_next_penalty():
    from kcore_spark.protocol.records import Record, encode_record_batch

    fe = KafkaFrontend()
    fe.wire_log.create_topic("q", 1)
    batch = encode_record_batch([Record(key=b"k", value=b"v" * 256, timestamp_ms=1_700_000_000_000)], base_offset=0)
    fe.handle_request(_produce_frame("q", 0, batch, corr=7))
    fe.quota_manager.set_quota("client-id", "etl", "consumer_byte_rate", 10.0)

    def fetch_frame(corr):
        w = wire.Writer()
        w.int16(wire.FETCH_KEY).int16(4).int32(corr)
        w.nullable_string("etl")
        w.int32(-1).int32(100).int32(1).int32(1 << 22).int8(0)
        w.int32(1)
        w.nullable_string("q")
        w.int32(1)
        w.int32(0).int64(0).int32(1 << 20)
        return w.bytes()

    r1 = wire.Reader(fe.handle_request(fetch_frame(8)))
    assert r1.int32() == 8
    first_throttle = r1.int32()
    assert first_throttle == 0  # no standing penalty yet
    # the fetched bytes exceeded the 10 B/s quota → next fetch pays
    r2 = wire.Reader(fe.handle_request(fetch_frame(9)))
    assert r2.int32() == 9
    assert r2.int32() > 0


def test_window_eviction_bounds_memory():
    """Windows for client-ids that stopped sending are evicted once
    expired: with a default client-id quota, attacker-chosen client-id
    strings must not grow _windows without bound (ADVICE r8)."""
    from kcore_spark.protocol.quotas import WINDOW_MS, QuotaManager

    qm = QuotaManager()
    qm.set_quota("client-id", None, "producer_byte_rate", 1e9)
    t = 1_000_000
    for i in range(5000):
        qm.record_and_throttle("producer_byte_rate", 10, t, client_id=f"c{i}")
    assert len(qm._windows) == 5000
    # next call past the window boundary prunes the expired entries
    qm.record_and_throttle(
        "producer_byte_rate", 10, t + 2 * WINDOW_MS, client_id="fresh"
    )
    assert len(qm._windows) == 1

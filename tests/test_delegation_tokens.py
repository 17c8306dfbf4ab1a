"""KIP-48 delegation tokens (k38-k41) and KIP-101/320
OffsetForLeaderEpoch (k23): store semantics, the error lattice
(disabled / not-found / owner-mismatch / expired / anonymous), wire
round-trips at rigid v0 and the flexible ceiling, and the epoch-0
end-offset contract of a single-generation leader."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import tokens, wire
from kcore_spark.protocol.auth import SaslState
from kcore_spark.protocol.server import KafkaFrontend

SECRET = b"master-secret"
NOW = 1_700_000_000_000


def _store() -> tokens.DelegationTokenStore:
    return tokens.DelegationTokenStore(SECRET)


def _create_req(v: int, renewers=(), max_lifetime_ms=-1, owner=None) -> bytes:
    flex = v >= 2
    w = wire.Writer()
    w.int16(tokens.CREATE_KEY).int16(v).int32(1)
    w.nullable_string("t")
    if flex:
        w.empty_tagged_fields()
    wr_str = w.compact_string if flex else w.nullable_string
    if v >= 3:
        wr_str(owner[0] if owner else None)
        wr_str(owner[1] if owner else None)
    if flex:
        w.compact_array_len(len(renewers))
    else:
        w.int32(len(renewers))
    for rt, rn in renewers:
        wr_str(rt)
        wr_str(rn)
        if flex:
            w.empty_tagged_fields()
    w.int64(max_lifetime_ms)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def _parse_create(resp: bytes, v: int):
    flex = v >= 2
    r = wire.Reader(resp)
    corr = r.int32()
    if flex:
        r.tagged_fields()
    rd_str = r.compact_string if flex else r.nullable_string
    rd_bytes = r.compact_bytes if flex else r.nullable_bytes
    out = {"corr": corr, "error": r.int16()}
    out["owner"] = (rd_str(), rd_str())
    if v >= 3:
        out["requester"] = (rd_str(), rd_str())
    out["issue"], out["expiry"], out["max"] = r.int64(), r.int64(), r.int64()
    out["token_id"], out["hmac"] = rd_str(), rd_bytes()
    out["throttle"] = r.int32()
    return out


def _renew_req(key: int, v: int, hmac: bytes, period_ms: int) -> bytes:
    flex = v >= 2
    w = wire.Writer()
    w.int16(key).int16(v).int32(2)
    w.nullable_string("t")
    if flex:
        w.empty_tagged_fields()
    (w.compact_bytes if flex else w.nullable_bytes)(hmac)
    w.int64(period_ms)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def _parse_renew(resp: bytes, v: int):
    flex = v >= 2
    r = wire.Reader(resp)
    corr = r.int32()
    if flex:
        r.tagged_fields()
    return {"corr": corr, "error": r.int16(), "expiry": r.int64(), "throttle": r.int32()}


# ------------------------------------------------------------ store


def test_create_renew_expire_lifecycle_v0():
    st = _store()
    resp = tokens.handle_create(
        st, _create_req(0, renewers=[("User", "bob")]), principal="User:alice", now_ms=NOW
    )
    out = _parse_create(resp, 0)
    assert out["error"] == wire.ERR_NONE
    assert out["owner"] == ("User", "alice")
    assert out["issue"] == NOW
    assert out["expiry"] == NOW + tokens.DEFAULT_RENEW_MS
    assert out["max"] == NOW + tokens.DEFAULT_MAX_LIFETIME_MS
    h = out["hmac"]
    assert st.by_hmac(h).token_id == out["token_id"]

    # renew (by the listed renewer) extends but never past max
    r1 = _parse_renew(
        tokens.handle_renew(
            st, _renew_req(tokens.RENEW_KEY, 0, h, 3600_000), principal="User:bob", now_ms=NOW + 10
        ),
        0,
    )
    assert r1["error"] == wire.ERR_NONE and r1["expiry"] == NOW + 10 + 3600_000

    # expire with negative period revokes immediately
    r2 = _parse_renew(
        tokens.handle_expire(
            st, _renew_req(tokens.EXPIRE_KEY, 0, h, -1), principal="User:alice", now_ms=NOW + 20
        ),
        0,
    )
    assert r2["error"] == wire.ERR_NONE and st.tokens == {}

    # further renew: not found
    r3 = _parse_renew(
        tokens.handle_renew(
            st, _renew_req(tokens.RENEW_KEY, 0, h, 1000), principal="User:alice", now_ms=NOW + 30
        ),
        0,
    )
    assert r3["error"] == tokens.ERR_DELEGATION_TOKEN_NOT_FOUND


def test_error_lattice():
    # disabled store
    off = tokens.DelegationTokenStore(None)
    assert (
        _parse_create(
            tokens.handle_create(off, _create_req(2), principal="User:a", now_ms=NOW), 2
        )["error"]
        == tokens.ERR_DELEGATION_TOKEN_AUTH_DISABLED
    )
    st = _store()
    # anonymous caller cannot mint tokens
    assert (
        _parse_create(tokens.handle_create(st, _create_req(2), now_ms=NOW), 2)["error"]
        == tokens.ERR_DELEGATION_TOKEN_REQUEST_NOT_ALLOWED
    )
    # owner mismatch on renew: a stranger may not manage the token
    out = _parse_create(
        tokens.handle_create(st, _create_req(2), principal="User:alice", now_ms=NOW), 2
    )
    r = _parse_renew(
        tokens.handle_renew(
            st,
            _renew_req(tokens.RENEW_KEY, 2, out["hmac"], 1000),
            principal="User:mallory",
            now_ms=NOW,
        ),
        2,
    )
    assert r["error"] == tokens.ERR_DELEGATION_TOKEN_OWNER_MISMATCH
    # expired token
    r2 = _parse_renew(
        tokens.handle_renew(
            st,
            _renew_req(tokens.RENEW_KEY, 2, out["hmac"], 1000),
            principal="User:alice",
            now_ms=out["expiry"] + 1,
        ),
        2,
    )
    assert r2["error"] == tokens.ERR_DELEGATION_TOKEN_EXPIRED
    # garbage hmac
    r3 = _parse_renew(
        tokens.handle_renew(
            st,
            _renew_req(tokens.RENEW_KEY, 2, b"\x00" * 64, 1000),
            principal="User:alice",
            now_ms=NOW,
        ),
        2,
    )
    assert r3["error"] == tokens.ERR_DELEGATION_TOKEN_NOT_FOUND


def test_max_lifetime_caps_expiry():
    st = _store()
    out = _parse_create(
        tokens.handle_create(
            st, _create_req(3, max_lifetime_ms=5000), principal="User:alice", now_ms=NOW
        ),
        3,
    )
    assert out["max"] == NOW + 5000
    assert out["expiry"] == NOW + 5000  # renew window capped by max
    assert out["requester"] == ("User", "alice")
    r = _parse_renew(
        tokens.handle_renew(
            st,
            _renew_req(tokens.RENEW_KEY, 2, out["hmac"], 10_000_000),
            principal="User:alice",
            now_ms=NOW + 1000,
        ),
        2,
    )
    assert r["expiry"] == NOW + 5000  # never extends past max


def _parse_describe(resp: bytes, v: int):
    flex = v >= 2
    r = wire.Reader(resp)
    corr = r.int32()
    if flex:
        r.tagged_fields()
    rd_str = r.compact_string if flex else r.nullable_string
    rd_bytes = r.compact_bytes if flex else r.nullable_bytes
    err = r.int16()
    n = r.compact_array_len() if flex else r.int32()
    toks = []
    for _ in range(max(n, 0)):
        t = {"owner": (rd_str(), rd_str())}
        if v >= 3:
            t["requester"] = (rd_str(), rd_str())
        t["issue"], t["expiry"], t["max"] = r.int64(), r.int64(), r.int64()
        t["token_id"], t["hmac"] = rd_str(), rd_bytes()
        nr = r.compact_array_len() if flex else r.int32()
        t["renewers"] = []
        for _ in range(max(nr, 0)):
            t["renewers"].append((rd_str(), rd_str()))
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()
        toks.append(t)
    throttle = r.int32()
    return {"corr": corr, "error": err, "tokens": toks, "throttle": throttle}


def _describe_req(v: int, owners=None) -> bytes:
    flex = v >= 2
    w = wire.Writer()
    w.int16(tokens.DESCRIBE_KEY).int16(v).int32(3)
    w.nullable_string("t")
    if flex:
        w.empty_tagged_fields()
    wr_str = w.compact_string if flex else w.nullable_string
    if owners is None:
        (w.compact_array_len if flex else w.int32)(-1)
    else:
        (w.compact_array_len if flex else w.int32)(len(owners))
        for ot, on in owners:
            wr_str(ot)
            wr_str(on)
            if flex:
                w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


@pytest.mark.parametrize("v", [0, 3])
def test_describe_filters_by_owner(v):
    st = _store()
    tokens.handle_create(st, _create_req(0), principal="User:alice", now_ms=NOW)
    tokens.handle_create(
        st, _create_req(0, renewers=[("User", "carol")]), principal="User:bob", now_ms=NOW + 1
    )
    allt = _parse_describe(
        tokens.handle_describe(st, _describe_req(v), principal="User:alice", now_ms=NOW + 2),
        v,
    )
    assert allt["error"] == wire.ERR_NONE and len(allt["tokens"]) == 2
    only_bob = _parse_describe(
        tokens.handle_describe(
            st,
            _describe_req(v, owners=[("User", "bob")]),
            principal="User:alice",
            now_ms=NOW + 2,
        ),
        v,
    )
    assert len(only_bob["tokens"]) == 1
    t = only_bob["tokens"][0]
    assert t["owner"] == ("User", "bob") and t["renewers"] == [("User", "carol")]
    if v >= 3:
        assert t["requester"] == ("User", "bob")


def test_describe_refuses_anonymous_and_gates_by_acl():
    """The describe response carries each token's hmac — the
    credential itself — so unauthenticated callers are refused and,
    with an authorizer configured, a caller only sees tokens it
    owns / requested / may renew or is DESCRIBE_TOKENS-authorized for
    (ADVICE r8 medium)."""
    st = _store()
    tokens.handle_create(st, _create_req(0), principal="User:alice", now_ms=NOW)
    tokens.handle_create(
        st, _create_req(0, renewers=[("User", "alice")]), principal="User:bob", now_ms=NOW + 1
    )
    tokens.handle_create(st, _create_req(0), principal="User:dave", now_ms=NOW + 2)
    # ANONYMOUS: refused outright when the store is enabled
    anon = _parse_describe(tokens.handle_describe(st, _describe_req(2), now_ms=NOW + 3), 2)
    assert anon["error"] == tokens.ERR_DELEGATION_TOKEN_REQUEST_NOT_ALLOWED
    assert anon["tokens"] == []
    # deny-all authorizer: alice still sees her own token and bob's
    # (she is a listed renewer) but NOT dave's
    vis = _parse_describe(
        tokens.handle_describe(
            st,
            _describe_req(2),
            principal="User:alice",
            authorize_describe=lambda owner: False,
            now_ms=NOW + 3,
        ),
        2,
    )
    assert vis["error"] == wire.ERR_NONE
    assert sorted(t["owner"][1] for t in vis["tokens"]) == ["alice", "bob"]
    # allow-all authorizer (or none): everything is visible
    vis_all = _parse_describe(
        tokens.handle_describe(
            st,
            _describe_req(2),
            principal="User:alice",
            authorize_describe=lambda owner: True,
            now_ms=NOW + 3,
        ),
        2,
    )
    assert len(vis_all["tokens"]) == 3


def test_describe_gc_expired_tokens():
    """Expired tokens vanish from describe AND from the store — the
    upstream cleanup-pass equivalent, GC'd on access (ADVICE r8)."""
    st = _store()
    out = _parse_create(
        tokens.handle_create(
            st, _create_req(3, max_lifetime_ms=5000), principal="User:alice", now_ms=NOW
        ),
        3,
    )
    live = _parse_describe(
        tokens.handle_describe(st, _describe_req(2), principal="User:alice", now_ms=NOW + 1000),
        2,
    )
    assert len(live["tokens"]) == 1
    dead = _parse_describe(
        tokens.handle_describe(
            st, _describe_req(2), principal="User:alice", now_ms=out["expiry"] + 1
        ),
        2,
    )
    assert dead["tokens"] == [] and st.tokens == {}


def test_renew_with_zero_period_expires_now():
    """renew_period_ms == 0 must set expiry to NOW, not extend by the
    default renew window — only negative periods take the default
    (ADVICE r8)."""
    st = _store()
    out = _parse_create(
        tokens.handle_create(st, _create_req(2), principal="User:alice", now_ms=NOW), 2
    )
    r = _parse_renew(
        tokens.handle_renew(
            st,
            _renew_req(tokens.RENEW_KEY, 2, out["hmac"], 0),
            principal="User:alice",
            now_ms=NOW + 500,
        ),
        2,
    )
    assert r["error"] == wire.ERR_NONE and r["expiry"] == NOW + 500
    # negative period: default renew window (capped by max)
    r2 = _parse_renew(
        tokens.handle_renew(
            st,
            _renew_req(tokens.RENEW_KEY, 2, out["hmac"], -1),
            principal="User:alice",
            now_ms=NOW + 501,
        ),
        2,
    )
    assert r2["error"] == tokens.ERR_DELEGATION_TOKEN_EXPIRED  # zero-renew killed it


# ------------------------------------------------- frontend dispatch


def test_frontend_routes_token_apis_with_sasl_principal():
    fe = KafkaFrontend(delegation_token_secret=SECRET)
    sasl = SaslState(authenticated=True, authorization_id="alice")
    resp = fe.handle_request(_create_req(3), sasl=sasl)
    out = _parse_create(resp, 3)
    assert out["error"] == wire.ERR_NONE and out["owner"] == ("User", "alice")
    d = _parse_describe(fe.handle_request(_describe_req(3), sasl=sasl), 3)
    assert len(d["tokens"]) == 1 and d["tokens"][0]["hmac"] == out["hmac"]


def test_frontend_token_apis_disabled_without_secret():
    fe = KafkaFrontend()
    sasl = SaslState(authenticated=True, authorization_id="alice")
    out = _parse_create(fe.handle_request(_create_req(0), sasl=sasl), 0)
    assert out["error"] == tokens.ERR_DELEGATION_TOKEN_AUTH_DISABLED


# ---------------------------------------------- OffsetForLeaderEpoch


def _ofle_req(v: int, topic: str, partition: int, leader_epoch: int, current=-1) -> bytes:
    flex = v >= 4
    w = wire.Writer()
    w.int16(wire.OFFSET_FOR_LEADER_EPOCH_KEY).int16(v).int32(9)
    w.nullable_string("t")
    if flex:
        w.empty_tagged_fields()
    if v >= 3:
        w.int32(-1)  # replica_id: consumer
    (w.compact_array_len if flex else w.int32)(1)
    (w.compact_string if flex else w.nullable_string)(topic)
    (w.compact_array_len if flex else w.int32)(1)
    w.int32(partition)
    if v >= 2:
        w.int32(current)
    w.int32(leader_epoch)
    if flex:
        w.empty_tagged_fields()
        w.empty_tagged_fields()
        w.empty_tagged_fields()
    return w.bytes()


def _parse_ofle(resp: bytes, v: int):
    flex = v >= 4
    r = wire.Reader(resp)
    corr = r.int32()
    if flex:
        r.tagged_fields()
    throttle = r.int32() if v >= 2 else 0
    n = r.compact_array_len() if flex else r.int32()
    assert n == 1
    topic = (r.compact_string() if flex else r.nullable_string())
    np = r.compact_array_len() if flex else r.int32()
    assert np == 1
    err = r.int16()
    partition = r.int32()
    epoch = r.int32() if v >= 1 else -1
    end = r.int64()
    return {"corr": corr, "throttle": throttle, "topic": topic, "error": err,
            "partition": partition, "epoch": epoch, "end": end}


@pytest.mark.parametrize("v", [0, 2, 4])
def test_offset_for_leader_epoch_answers_epoch_zero_end(v):
    from kcore_spark.protocol.records import Record

    fe = KafkaFrontend()
    fe.wire_log.create_topic("ofle", 1)
    fe.wire_log.append("ofle", 0, [Record(key=None, value=b"x", timestamp_ms=1)])
    out = _parse_ofle(fe.handle_request(_ofle_req(v, "ofle", 0, 0)), v)
    assert out["error"] == wire.ERR_NONE
    assert out["end"] == fe.wire_log.high_watermark("ofle", 0)
    if v >= 1:
        assert out["epoch"] == 0


def test_offset_for_leader_epoch_error_paths():
    from kcore_spark.protocol.admin import (
        ERR_UNKNOWN_LEADER_EPOCH,
    )

    fe = KafkaFrontend()
    fe.wire_log.create_topic("ofle", 1)
    # a future epoch this leader never led
    out = _parse_ofle(fe.handle_request(_ofle_req(4, "ofle", 0, 7)), 4)
    assert out["error"] == ERR_UNKNOWN_LEADER_EPOCH and out["end"] == -1
    # unknown topic
    out2 = _parse_ofle(fe.handle_request(_ofle_req(4, "nope", 0, 0)), 4)
    assert out2["error"] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    # fencing field from the future
    out3 = _parse_ofle(fe.handle_request(_ofle_req(2, "ofle", 0, 0, current=3)), 2)
    assert out3["error"] == ERR_UNKNOWN_LEADER_EPOCH

"""ACL authorizer: matching semantics (literal/prefixed, deny-over-
allow, super users), CRUD wire APIs (29/30/31), and data-path
enforcement on Produce/Fetch by SASL principal."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.acl import (
    OP_ALL,
    OP_READ,
    OP_WRITE,
    PAT_LITERAL,
    PAT_PREFIXED,
    PERM_ALLOW,
    PERM_DENY,
    RES_TOPIC,
    AclBinding,
    AclStore,
)
from kcore_spark.protocol.records import Record, encode_record_batch
from kcore_spark.protocol.server import KafkaFrontend


def b(
    name, principal, op, perm, pattern=PAT_LITERAL, host="*", rtype=RES_TOPIC
) -> AclBinding:
    return AclBinding(rtype, name, pattern, principal, host, op, perm)


# ------------------------------------------------- matching semantics


def test_default_deny_and_literal_allow():
    store = AclStore()
    assert not store.authorize("User:alice", "WRITE", "TOPIC", "t")
    store.create(b("t", "User:alice", OP_WRITE, PERM_ALLOW))
    assert store.authorize("User:alice", "WRITE", "TOPIC", "t")
    assert not store.authorize("User:alice", "READ", "TOPIC", "t")
    assert not store.authorize("User:bob", "WRITE", "TOPIC", "t")
    assert not store.authorize("User:alice", "WRITE", "TOPIC", "other")


def test_deny_overrides_allow():
    store = AclStore()
    store.create(b("*", "User:alice", OP_ALL, PERM_ALLOW))
    store.create(b("secret", "User:alice", OP_READ, PERM_DENY))
    assert store.authorize("User:alice", "READ", "TOPIC", "public")
    assert not store.authorize("User:alice", "READ", "TOPIC", "secret")
    assert store.authorize("User:alice", "WRITE", "TOPIC", "secret")  # only READ denied


def test_prefixed_pattern_and_wildcard_principal():
    store = AclStore()
    store.create(b("logs-", "User:*", OP_READ, PERM_ALLOW, pattern=PAT_PREFIXED))
    assert store.authorize("User:anyone", "READ", "TOPIC", "logs-app1")
    assert not store.authorize("User:anyone", "READ", "TOPIC", "metrics-app1")


def test_super_user_bypasses_everything():
    store = AclStore(super_users={"User:admin"})
    store.create(b("*", "User:admin", OP_ALL, PERM_DENY))
    assert store.authorize("User:admin", "WRITE", "TOPIC", "anything")


def test_all_operation_covers_specific():
    store = AclStore()
    store.create(b("t", "User:alice", OP_ALL, PERM_ALLOW))
    assert store.authorize("User:alice", "READ", "TOPIC", "t")
    assert store.authorize("User:alice", "WRITE", "TOPIC", "t")


# ------------------------------------------------- wire CRUD


@pytest.fixture()
def fe():
    f = KafkaFrontend(acl_store=AclStore())
    f.wire_log.create_topic("alpha", 1)
    return f


def _create_acls(fe, creations, version=1, corr=50):
    w = wire.Writer()
    w.int16(wire.CREATE_ACLS_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.int32(len(creations))
    for c in creations:
        w.int8(c.resource_type)
        w.nullable_string(c.resource_name)
        if version >= 1:
            w.int8(c.pattern_type)
        w.nullable_string(c.principal)
        w.nullable_string(c.host)
        w.int8(c.operation)
        w.int8(c.permission)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    r.int32()  # throttle
    return [
        (r.int16(), r.nullable_string()) for _ in range(r.int32())
    ]


def _describe_acls(fe, version=1, resource_name=None, principal=None, corr=51):
    w = wire.Writer()
    w.int16(wire.DESCRIBE_ACLS_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.int8(1)  # resource_type ANY
    w.nullable_string(resource_name)
    if version >= 1:
        w.int8(1)  # pattern_type ANY
    w.nullable_string(principal)
    w.nullable_string(None)  # host
    w.int8(1)  # operation ANY
    w.int8(1)  # permission ANY
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    r.nullable_string()
    out = []
    for _ in range(r.int32()):
        rt = r.int8()
        rn = r.nullable_string()
        pt = r.int8() if version >= 1 else PAT_LITERAL
        for _ in range(r.int32()):
            out.append(
                (rn, pt, r.nullable_string(), r.nullable_string(), r.int8(), r.int8())
            )
    return out


def test_create_describe_delete_roundtrip(fe):
    acls = [
        b("alpha", "User:alice", OP_WRITE, PERM_ALLOW),
        b("logs-", "User:bob", OP_READ, PERM_ALLOW, pattern=PAT_PREFIXED),
    ]
    assert _create_acls(fe, acls) == [(0, None), (0, None)]
    got = _describe_acls(fe)
    assert len(got) == 2
    assert ("alpha", PAT_LITERAL, "User:alice", "*", OP_WRITE, PERM_ALLOW) in got
    # filtered describe
    got_alice = _describe_acls(fe, principal="User:alice")
    assert len(got_alice) == 1
    # delete by principal filter
    w = wire.Writer()
    w.int16(wire.DELETE_ACLS_KEY).int16(1).int32(52)
    w.nullable_string("pytest")
    w.int32(1)
    w.int8(1)  # ANY resource type
    w.nullable_string(None)
    w.int8(1)  # ANY pattern
    w.nullable_string("User:bob")
    w.nullable_string(None)
    w.int8(1)
    w.int8(1)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 52
    r.int32()
    assert r.int32() == 1  # one filter result
    assert r.int16() == wire.ERR_NONE
    r.nullable_string()
    assert r.int32() == 1  # one matching acl deleted
    assert len(_describe_acls(fe)) == 1


# ------------------------------------------------- data-path enforcement


def _produce(fe, topic, corr=60):
    batch = encode_record_batch([Record(b"k", b"v", 100)])
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(3).int32(corr)
    w.nullable_string("pytest")
    w.nullable_string(None)  # transactional_id
    w.int16(-1).int32(30000)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(0)
    w.int32(len(batch))
    w.raw(batch)
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.int32()  # one topic
    r.nullable_string()
    r.int32()  # one partition
    r.int32()  # index
    return r.int16()  # error code


def test_produce_denied_without_acl_and_allowed_with(fe):
    # authorization on, no bindings: ANONYMOUS is denied
    assert _produce(fe, "alpha") == 29  # TOPIC_AUTHORIZATION_FAILED
    fe.acl_store.create(b("alpha", "User:ANONYMOUS", OP_WRITE, PERM_ALLOW))
    assert _produce(fe, "alpha") == wire.ERR_NONE


def test_no_acl_store_means_authorization_off():
    f = KafkaFrontend()  # default: no authorizer configured
    f.wire_log.create_topic("alpha", 1)
    assert _produce(f, "alpha") == wire.ERR_NONE


# ------------------------------------ e2e: SASL principal drives ACLs


def test_e2e_sasl_principal_gates_produce():
    """Full TCP path: two users authenticate via SASL/PLAIN; only the
    one granted WRITE may produce, and the grant follows the
    PRINCIPAL, not the connection."""
    import asyncio
    import struct as _struct

    from tests.test_auth import _auth_req, _handshake_req, _plain_token, _talk

    creds = {"alice": "wonderland", "bob": "builder"}

    def produce_frame(topic, corr):
        batch = encode_record_batch([Record(b"k", b"v", 100)])
        w = wire.Writer()
        w.int16(wire.PRODUCE_KEY).int16(3).int32(corr)
        w.nullable_string("e2e")
        w.nullable_string(None)
        w.int16(-1).int32(30000)
        w.int32(1)
        w.nullable_string(topic)
        w.int32(1)
        w.int32(0)
        w.int32(len(batch))
        w.raw(batch)
        return w.bytes()

    def produce_err(resp):
        r = wire.Reader(resp)
        r.int32(), r.int32()
        r.nullable_string()
        r.int32(), r.int32()
        return r.int16()

    async def run():
        store = AclStore()
        store.create(b("alpha", "User:alice", OP_WRITE, PERM_ALLOW))
        fe = KafkaFrontend(port=0, credentials=creds, acl_store=store)
        fe.wire_log.create_topic("alpha", 1)
        await fe.start()
        try:
            alice = await _talk(
                fe.host,
                fe.port,
                [
                    _handshake_req(1, "PLAIN"),
                    _auth_req(_plain_token("alice", "wonderland")),
                    produce_frame("alpha", 70),
                ],
            )
            assert produce_err(alice[2]) == wire.ERR_NONE
            bob = await _talk(
                fe.host,
                fe.port,
                [
                    _handshake_req(1, "PLAIN"),
                    _auth_req(_plain_token("bob", "builder")),
                    produce_frame("alpha", 71),
                ],
            )
            assert produce_err(bob[2]) == 29  # TOPIC_AUTHORIZATION_FAILED
        finally:
            await fe.stop()

    asyncio.run(run())


# ------------------------------- control-plane authorization (keys 48-51)
# ADVICE r8: mutating SCRAM credentials / client quotas is a
# cluster-level privilege — an authenticated principal without ALTER on
# the Cluster resource must get error 31 and no mutation; and key 51 on
# a listener with no SCRAM store configured must be rejected rather
# than lazily creating one (which would flip SASL enforcement on).

import hashlib as _hashlib
import struct as _struct

from kcore_spark.protocol.acl import OP_ALTER, RES_CLUSTER


def _uv(n: int) -> bytes:
    out = b""
    while True:
        bb = n & 0x7F
        n >>= 7
        if n:
            out += bytes([bb | 0x80])
        else:
            return out + bytes([bb])


def _cstr(s: str) -> bytes:
    e = s.encode()
    return _uv(len(e) + 1) + e


def _cbytes(b: bytes) -> bytes:
    return _uv(len(b) + 1) + b


def _hdr2(key, ver, corr, client="cli"):
    e = client.encode()
    return (
        _struct.pack(">hhi", key, ver, corr)
        + _struct.pack(">h", len(e))
        + e
        + _uv(0)
    )


_SALT51 = b"fedcba9876543210"
_SALTED51 = _hashlib.pbkdf2_hmac("sha256", b"hijack", _SALT51, 4096)

ALTER_SCRAM_FRAME = (
    _hdr2(51, 0, 70)
    + _uv(1)  # no deletions (compact array len 0 -> uv(1))
    + _uv(2)  # one upsertion
    + _cstr("victim")
    + bytes([1])  # SCRAM_SHA_256
    + _struct.pack(">i", 4096)
    + _cbytes(_SALT51)
    + _cbytes(_SALTED51)
    + _uv(0)
    + _uv(0)
)


def _sasl_session(user="mallory"):
    from kcore_spark.protocol.auth import SaslState

    s = SaslState()
    s.authenticated = True
    s.authorization_id = user
    return s


def test_alter_scram_requires_cluster_alter():
    store = AclStore()
    fe = KafkaFrontend(acl_store=store, scram_credentials={})
    resp = fe.handle_request(ALTER_SCRAM_FRAME, sasl=_sasl_session())
    # per-result error 31, nothing stored
    assert fe.scram_credentials == {}
    assert _struct.pack(">h", 31) in resp
    # grant ALTER on Cluster -> same request now provisions the verifier
    store.create(
        AclBinding(RES_CLUSTER, "kafka-cluster", PAT_LITERAL,
                   "User:mallory", "*", OP_ALTER, PERM_ALLOW)
    )
    resp2 = fe.handle_request(ALTER_SCRAM_FRAME, sasl=_sasl_session())
    assert ("victim", "SCRAM-SHA-256") in fe.scram_credentials
    assert _struct.pack(">h", 31) not in resp2


def test_alter_scram_rejected_when_store_unconfigured():
    fe = KafkaFrontend()  # open listener: no credentials, no SCRAM
    assert fe.scram_credentials is None
    resp = fe.handle_request(ALTER_SCRAM_FRAME, sasl=None)
    # INVALID_REQUEST per result; posture unchanged (store NOT created)
    assert fe.scram_credentials is None
    assert _struct.pack(">h", 42) in resp


def test_alter_quotas_requires_cluster_alter():
    store = AclStore()
    fe = KafkaFrontend(acl_store=store)
    w = wire.Writer()
    w.int16(49).int16(0).int32(71)
    w.nullable_string("cli")
    w.int32(1)  # one entry
    w.int32(1)  # one entity
    w.nullable_string("client-id")
    w.nullable_string("noisy")
    w.int32(1)  # one op
    w.nullable_string("producer_byte_rate")
    w.float64(1024.0)
    w.raw(b"\x00")  # remove=false
    w.raw(b"\x00")  # validate_only=false
    frame = w.bytes()
    resp = fe.handle_request(frame, sasl=_sasl_session())
    assert fe.quota_manager.quotas == {}
    assert _struct.pack(">h", 31) in resp
    store.create(
        AclBinding(RES_CLUSTER, "kafka-cluster", PAT_LITERAL,
                   "User:mallory", "*", OP_ALTER, PERM_ALLOW)
    )
    fe.handle_request(frame, sasl=_sasl_session())
    assert fe.quota_manager.quotas == {
        ("client-id", "noisy"): {"producer_byte_rate": 1024.0}
    }

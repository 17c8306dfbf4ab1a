"""Golden byte frames for the r5/r6 protocol keys at their TOP
supported versions (r6 VERDICT #6): k25 AddOffsetsToTxn v3, k28
TxnOffsetCommit v3, k29/k30/k31 ACLs v1, k35 DescribeLogDirs v2,
k37 CreatePartitions v3, k68 ConsumerGroupHeartbeat v1.

Frames are SPEC-derived: encoded field-by-field below with a tiny
struct-based builder that shares no code with protocol/wire.py, so a
symmetric encode/decode bug in the production codec cannot hide (the
same independence a real Kafka client would provide — neither
kafka-python nor confluent-kafka is installed in this container).
Layouts follow the Apache Kafka protocol guide message definitions:
request header v2 = api_key int16, api_version int16, correlation_id
int32, client_id classic NULLABLE_STRING, tagged fields; flexible
versions use COMPACT_STRING (uvarint len+1) / COMPACT_ARRAY
(uvarint n+1) with 0x00 for null.

Reference parity: the reference broker answers only ApiVersions
(`/root/reference/pkg/kafka/versions.go:21-24`); these keys realize
rows its README declares as roadmap (transactions, security, admin).
"""

from __future__ import annotations

import struct

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend


# ---------------------------------------------------------- spec-side builder
def i8(v):
    return struct.pack(">b", v)


def i16(v):
    return struct.pack(">h", v)


def i32(v):
    return struct.pack(">i", v)


def i64(v):
    return struct.pack(">q", v)


def uv(n: int) -> bytes:  # unsigned varint
    out = b""
    while True:
        b_ = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b_ | 0x80])
        else:
            return out + bytes([b_])


def nstr(s: str | None) -> bytes:  # classic NULLABLE_STRING
    if s is None:
        return i16(-1)
    b_ = s.encode()
    return i16(len(b_)) + b_


def cstr(s: str | None) -> bytes:  # COMPACT_NULLABLE_STRING
    if s is None:
        return uv(0)
    b_ = s.encode()
    return uv(len(b_) + 1) + b_


def carr(n: int | None) -> bytes:  # COMPACT_ARRAY length (None = null)
    return uv(0) if n is None else uv(n + 1)


TAG = uv(0)  # empty tagged-field section


def hdr2(key: int, ver: int, corr: int, client: str = "cli") -> bytes:
    """Request header v2 (flexible APIs)."""
    return i16(key) + i16(ver) + i32(corr) + nstr(client) + TAG


def hdr1(key: int, ver: int, corr: int, client: str = "cli") -> bytes:
    """Request header v1 (classic APIs)."""
    return i16(key) + i16(ver) + i32(corr) + nstr(client)


# ---------------------------------------------------------- fixtures

@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("alpha", 1)
    return f


# InitProducerId v0 (classic): transactional_id, transaction_timeout_ms
INIT_PID_TX7 = hdr1(22, 0, 40) + nstr("tx-7") + i32(60_000)

# AddOffsetsToTxn v3 (flexible): transactional_id, producer_id,
# producer_epoch, group_id, tags
ADD_OFFSETS_V3 = hdr2(25, 3, 41) + cstr("tx-7") + i64(0) + i16(0) + cstr("g1") + TAG

# TxnOffsetCommit v3 (flexible): transactional_id, group_id,
# producer_id, producer_epoch, generation_id, member_id,
# group_instance_id, topics[name, partitions[index, offset,
# leader_epoch, metadata, tags], tags], tags
TXN_OFFSET_COMMIT_V3 = (
    hdr2(28, 3, 42)
    + cstr("tx-7")
    + cstr("g1")
    + i64(0)
    + i16(0)
    + i32(1)          # generation_id
    + cstr("m1")      # member_id
    + cstr(None)      # group_instance_id
    + carr(1)         # one topic
    + cstr("alpha")
    + carr(1)         # one partition
    + i32(0)          # partition_index
    + i64(42)         # committed_offset
    + i32(0)          # committed_leader_epoch (v2+)
    + cstr(None)      # committed_metadata
    + TAG             # partition tags
    + TAG             # topic tags
    + TAG             # request tags
)

# EndTxn v0 (classic): transactional_id, producer_id, producer_epoch,
# committed bool
END_TXN_COMMIT_V0 = hdr1(26, 0, 43) + nstr("tx-7") + i64(0) + i16(0) + b"\x01"

# CreateAcls v1 (classic): creations[resource_type, resource_name,
# pattern_type(v1), principal, host, operation, permission]
CREATE_ACLS_V1 = (
    hdr1(30, 1, 44)
    + i32(1)
    + i8(2)                 # resource_type TOPIC
    + nstr("alpha")
    + i8(3)                 # pattern_type LITERAL
    + nstr("User:alice")
    + nstr("*")
    + i8(4)                 # operation WRITE
    + i8(3)                 # permission ALLOW
)

# DescribeAcls v1 (classic): one filter [resource_type, resource_name,
# pattern_type(v1), principal, host, operation, permission]
DESCRIBE_ACLS_V1 = (
    hdr1(29, 1, 45)
    + i8(2)                 # TOPIC
    + nstr(None)            # any resource name
    + i8(1)                 # pattern ANY
    + nstr(None)            # any principal
    + nstr(None)            # any host
    + i8(1)                 # operation ANY
    + i8(1)                 # permission ANY
)

# DeleteAcls v1 (classic): filters[...same filter layout...]
DELETE_ACLS_V1 = (
    hdr1(31, 1, 46)
    + i32(1)
    + i8(2)
    + nstr("alpha")
    + i8(1)                 # pattern ANY
    + nstr(None)
    + nstr(None)
    + i8(1)
    + i8(1)
)

# CreatePartitions v3 (flexible): topics[name, count, assignments
# (null), tags], timeout_ms, validate_only, tags
CREATE_PARTITIONS_V3 = (
    hdr2(37, 3, 47)
    + carr(1)
    + cstr("alpha")
    + i32(3)          # new partition count
    + carr(None)      # assignments: null
    + TAG
    + i32(30_000)     # timeout_ms
    + b"\x00"         # validate_only = false
    + TAG
)

# DescribeLogDirs v2 (flexible): topics = null (all), tags
DESCRIBE_LOG_DIRS_V2 = hdr2(35, 2, 48) + carr(None) + TAG

# ConsumerGroupHeartbeat v1 (flexible, KIP-848): group_id, member_id
# (empty = assign one), member_epoch 0 (join), instance_id null,
# rack_id null, rebalance_timeout_ms, subscribed_topic_names,
# subscribed_topic_regex (v1, null = unset), server_assignor null,
# topic_partitions null, tags
CG_HEARTBEAT_V1 = (
    hdr2(68, 1, 49)
    + cstr("cg7")
    + cstr("")        # member_id: empty → server assigns
    + i32(0)          # member_epoch: join
    + cstr(None)      # instance_id
    + cstr(None)      # rack_id
    + i32(30_000)
    + carr(1)
    + cstr("alpha")
    + cstr(None)      # subscribed_topic_regex (v1)
    + cstr(None)      # server_assignor
    + carr(None)      # owned topic_partitions
    + TAG
)


# ---------------------------------------------------------- tests

def _resp_reader_flex(resp: bytes, corr: int) -> wire.Reader:
    r = wire.Reader(resp)
    assert r.int32() == corr
    assert r.unsigned_varint() == 0  # response header v1 tagged fields
    return r


def test_golden_eos_pair_v3_end_to_end(fe):
    """k25 v3 + k28 v3 at top version: offsets staged in the txn, then
    applied atomically at EndTxn commit — the whole EOS handshake from
    golden frames only."""
    fe.handle_request(INIT_PID_TX7)  # pid 0, epoch 0 (first pid)

    r = _resp_reader_flex(fe.handle_request(ADD_OFFSETS_V3), 41)
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE

    r = _resp_reader_flex(fe.handle_request(TXN_OFFSET_COMMIT_V3), 42)
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "alpha"
    assert r.compact_array_len() == 1
    assert r.int32() == 0  # partition
    assert r.int16() == wire.ERR_NONE
    # staged, not yet visible
    assert fe.group_store.fetch("g1", "alpha", 0) == -1

    r = wire.Reader(fe.handle_request(END_TXN_COMMIT_V0))
    assert r.int32() == 43
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE
    # EndTxn(commit) applied the staged offset atomically
    assert fe.group_store.fetch("g1", "alpha", 0) == 42


def test_golden_txn_offset_commit_without_add_offsets(fe):
    """Ordering contract: staging without a prior AddOffsetsToTxn for
    the group answers INVALID_TXN_STATE (48) per partition."""
    fe.handle_request(INIT_PID_TX7)
    r = _resp_reader_flex(fe.handle_request(TXN_OFFSET_COMMIT_V3), 42)
    r.int32()  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "alpha"
    assert r.compact_array_len() == 1
    assert r.int32() == 0
    assert r.int16() == 48  # INVALID_TXN_STATE


def test_golden_acls_v1_create_describe_delete(fe):
    # create
    r = wire.Reader(fe.handle_request(CREATE_ACLS_V1))
    assert r.int32() == 44
    assert r.int32() == 0  # throttle
    assert r.int32() == 1  # one result
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() is None

    # describe sees it, with the v1 pattern_type byte present
    r = wire.Reader(fe.handle_request(DESCRIBE_ACLS_V1))
    assert r.int32() == 45
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() is None  # error_message
    assert r.int32() == 1  # one resource group
    assert r.int8() == 2  # TOPIC
    assert r.nullable_string() == "alpha"
    assert r.int8() == 3  # LITERAL (v1 field)
    assert r.int32() == 1  # one access entry
    assert r.nullable_string() == "User:alice"
    assert r.nullable_string() == "*"
    assert r.int8() == 4  # WRITE
    assert r.int8() == 3  # ALLOW

    # delete reports the matched binding back
    r = wire.Reader(fe.handle_request(DELETE_ACLS_V1))
    assert r.int32() == 46
    assert r.int32() == 0
    assert r.int32() == 1  # one filter result
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() is None
    assert r.int32() == 1  # one matching acl
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() is None
    assert r.int8() == 2
    assert r.nullable_string() == "alpha"
    assert r.int8() == 3
    assert r.nullable_string() == "User:alice"
    assert r.nullable_string() == "*"
    assert r.int8() == 4
    assert r.int8() == 3
    # and the store is empty again
    assert fe._acls().describe() == []


def test_golden_create_partitions_v3(fe):
    r = _resp_reader_flex(fe.handle_request(CREATE_PARTITIONS_V3), 47)
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "alpha"
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None  # error_message
    assert fe.wire_log.topics["alpha"] == 3


def test_golden_describe_log_dirs_v2_null_topics_means_all(fe):
    r = _resp_reader_flex(fe.handle_request(DESCRIBE_LOG_DIRS_V2), 48)
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1  # one log dir
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() == "/data/kcore-logs"
    assert r.compact_array_len() == 1  # alpha
    assert r.compact_string() == "alpha"
    assert r.compact_array_len() == 1  # one partition
    assert r.int32() == 0
    assert r.int64() >= 0  # size
    assert r.int64() == 0  # offset_lag
    assert r.int8() == 0  # is_future_key false


def test_golden_consumer_group_heartbeat_v1_join(fe):
    r = _resp_reader_flex(fe.handle_request(CG_HEARTBEAT_V1), 49)
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None  # error_message
    member_id = r.compact_string()
    assert member_id  # server assigned one
    assert r.int32() == 1  # member_epoch after join


# AlterUserScramCredentials v0 (flexible): deletions[] empty,
# upsertions[name, mechanism int8, iterations int32, salt, salted_pw,
# tags], tags. Salted password = PBKDF2-SHA256("pw9", salt, 4096).
import hashlib

_SALT = b"0123456789abcdef"
_SALTED = hashlib.pbkdf2_hmac("sha256", b"pw9", _SALT, 4096)


def cbytes(b: bytes) -> bytes:  # COMPACT_BYTES
    return uv(len(b) + 1) + b


ALTER_SCRAM_V0 = (
    hdr2(51, 0, 60)
    + carr(0)         # no deletions
    + carr(1)         # one upsertion
    + cstr("erin")
    + i8(1)           # SCRAM_SHA_256
    + i32(4096)
    + cbytes(_SALT)
    + cbytes(_SALTED)
    + TAG
    + TAG
)

DESCRIBE_SCRAM_V0 = hdr2(50, 0, 61) + carr(None) + TAG  # null users = all


def test_golden_alter_then_describe_user_scram(fe):
    from kcore_spark.protocol.scram import ScramClient, ScramExchange

    sess = __import__("kcore_spark.protocol.auth", fromlist=["SaslState"]).SaslState()
    sess.authenticated = True
    # SCRAM must be CONFIGURED at construction — key 51 no longer
    # lazily creates the store (that would let a data-plane request
    # flip SASL enforcement on an open listener, ADVICE r8 posture)
    fe.scram_credentials = {}
    r = _resp_reader_flex(fe.handle_request(ALTER_SCRAM_V0, sasl=sess), 60)
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "erin"
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None

    r = _resp_reader_flex(fe.handle_request(DESCRIBE_SCRAM_V0, sasl=sess), 61)
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE  # top-level
    assert r.compact_string() is None
    assert r.compact_array_len() == 1
    assert r.compact_string() == "erin"
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None
    assert r.compact_array_len() == 1
    assert r.int8() == 1 and r.int32() == 4096

    # the provisioned verifier really authenticates pw9
    ex = ScramExchange("SCRAM-SHA-256", fe.scram_credentials)
    cl = ScramClient("erin", "pw9")
    assert ex.server_final(cl.final(ex.server_first(cl.first()))) is not None

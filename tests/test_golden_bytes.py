"""Golden-byte protocol conformance (VERDICT r2 #1).

Every fixture below was assembled FIELD BY FIELD from the public Kafka
protocol spec (kafka.apache.org/protocol: message layouts, flexible
compact encodings, and the record-batch v2 format page) with an
independent stdlib-only assembler and an independent bitwise CRC32C —
NOT by round-tripping this repo's encoders. If our codec disagrees with
the spec on any field order, width, varint flavor, or CRC coverage,
these tests fail; a self-round-trip cannot catch such
wrong-on-both-sides bugs (the reference pinned its behavior against a
real Kafka deployment the same way, magefile.go:188-238).

Layout notes used to derive the bytes (public spec):
- Request header v1: api_key(int16) api_version(int16)
  correlation_id(int32) client_id(nullable_string)
- Request header v2 adds tagged_fields; flexible bodies use compact
  (unsigned-varint length+1) strings/arrays.
- RecordBatch v2: baseOffset(8) batchLength(4) partitionLeaderEpoch(4)
  magic(1)=2 crc(4, CRC32C of everything after it) attributes(2)
  lastOffsetDelta(4) baseTs(8) maxTs(8) producerId(8) producerEpoch(2)
  baseSequence(4) recordCount(4) records. Records use ZIGZAG varints.
- Raw snappy: uvarint(uncompressed_len) then tagged elements; literal
  tag (len-1)<<2, copy-1-byte tag (len-4)<<2|1 + offset byte.
"""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    decode_fetch_response,
    decode_produce_response,
)
from kcore_spark.protocol.records import (
    Record,
    decode_record_batch,
    decompress_block,
    encode_record_batch,
    encode_varint,
)
from kcore_spark.protocol.server import KafkaFrontend

TS = 1640995200000  # 2022-01-01T00:00:00Z

# -------------------------------------------------------- record batches

# one record, key=b"key" value=b"value", base_offset 0:
#   00000000 00000000 | 00000040 | 00000000 | 02 | c74d6960 (crc32c) |
#   0000 | 00000000 | 17e12ef9c00 ×2 | -1/-1/-1 | 00000001 |
#   1c(len=14) 00(attrs) 00(tsΔ) 00(offΔ) 06"key" 0a"value" 00(headers)
BATCH_ONE = bytes.fromhex(
    "0000000000000000000000400000000002c74d69600000000000000000017e12ef9c0000"
    "00017e12ef9c00ffffffffffffffffffffffffffff000000011c000000066b65790a7661"
    "6c756500"
)

# two records at base_offset 5: (b"k1",b"first") then a null-key record
# (None,b"second") with tsΔ=1000, offΔ=1 and one header ("h",b"x")
BATCH_TWO = bytes.fromhex(
    "0000000000000005000000510000000002999ac7e10000000000010000017e12ef9c0000"
    "00017e12ef9fe8ffffffffffffffffffffffffffff000000021a000000046b310a666972"
    "7374002200d00f02010c7365636f6e640202680278"
)

# same two records, records-block gzip-compressed (attributes=1,
# canonical zlib output with mtime=0)
BATCH_GZIP = bytes.fromhex(
    "000000000000000000000065000000000277d416430001000000010000017e12ef9c0000"
    "00017e12ef9fe8ffffffffffffffffffffffffffff000000021f8b08000000000002039"
    "362606060c936e44acb2c2a2e615062b8c0cfc4c8539c9a9c9f97c2c494c1540100d8e9"
    "c80420000000"
)

# one record, records block as a RAW snappy block (attributes=2) — the
# librdkafka form our encoder never emits (it xerial-frames), so this
# can only pass if the decoder truly implements the foreign format:
#   0f(uncompressed len 15) 38(literal tag, len 15) + plain records
BATCH_SNAPPY_RAW = bytes.fromhex(
    "0000000000000000000000420000000002a2942a560002000000000000017e12ef9c0000"
    "00017e12ef9c00ffffffffffffffffffffffffffff000000010f381c000000066b65790a"
    "76616c756500"
)


def test_batch_one_decodes():
    base, recs, _ = decode_record_batch(BATCH_ONE)
    assert base == 0
    [r] = recs
    assert (r.key, r.value, r.timestamp_ms, r.offset) == (b"key", b"value", TS, 0)
    assert r.headers == []


def test_batch_one_encodes_byte_exact():
    got = encode_record_batch([Record(b"key", b"value", TS)])
    assert got == BATCH_ONE


def test_batch_two_decodes():
    base, recs, _ = decode_record_batch(BATCH_TWO)
    assert base == 5
    a, b = recs
    assert (a.key, a.value, a.timestamp_ms, a.offset) == (b"k1", b"first", TS, 5)
    assert (b.key, b.value, b.timestamp_ms, b.offset) == (None, b"second", TS + 1000, 6)
    assert b.headers == [("h", b"x")]


def test_batch_two_encodes_byte_exact():
    got = encode_record_batch(
        [
            Record(b"k1", b"first", TS),
            Record(None, b"second", TS + 1000, headers=[("h", b"x")]),
        ],
        base_offset=5,
    )
    assert got == BATCH_TWO


def test_batch_gzip_decodes():
    base, recs, _ = decode_record_batch(BATCH_GZIP)
    assert [r.value for r in recs] == [b"first", b"second"]
    assert recs[1].headers == [("h", b"x")]


def test_batch_gzip_encodes_byte_exact():
    got = encode_record_batch(
        [
            Record(b"k1", b"first", TS),
            Record(None, b"second", TS + 1000, headers=[("h", b"x")]),
        ],
        compression="gzip",
    )
    assert got == BATCH_GZIP


def test_batch_raw_snappy_foreign_form_decodes():
    base, recs, _ = decode_record_batch(BATCH_SNAPPY_RAW)
    [r] = recs
    assert (r.key, r.value) == (b"key", b"value")


# -------------------------------------------------------- zigzag varints

# worked examples from the varint spec: zigzag maps 0,-1,1,-2,2 → 0,1,2,3,4
@pytest.mark.parametrize(
    "value,encoded",
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (150, b"\xac\x02"),   # zigzag(150)=300 → AC 02
        (-151, b"\xad\x02"),  # zigzag(-151)=301
        (2**31 - 1, b"\xfe\xff\xff\xff\x0f"),
    ],
)
def test_zigzag_varint_spec_values(value, encoded):
    assert encode_varint(value) == encoded


# -------------------------------------------------------- snappy blocks

def test_snappy_spec_literal_block():
    # "hello": 05(uncompressed len) 10(literal tag len 5) hello
    assert decompress_block("snappy", bytes.fromhex("051068656c6c6f")) == b"hello"


def test_snappy_spec_copy_block():
    # 'a' then copy(offset=1, len=9) → 'a'*10: 0a 00 61 15 01
    assert decompress_block("snappy", bytes.fromhex("0a00611501")) == b"a" * 10


def test_gzip_canonical_stream():
    golden = bytes.fromhex(
        "1f8b0800000000000203cb4ece2f4a5548cfcf4949cd532848acccc94f4c0100701c073814000000"
    )
    assert decompress_block("gzip", golden) == b"kcore golden payload"


def test_lz4_official_frame():
    golden = bytes.fromhex(
        "04224d184040c0140000806b636f726520676f6c64656e207061796c6f616400000000"
    )
    assert decompress_block("lz4", golden) == b"kcore golden payload"


def test_zstd_official_frame():
    golden = bytes.fromhex("28b52ffd0048a100006b636f726520676f6c64656e207061796c6f6164")
    assert decompress_block("zstd", golden) == b"kcore golden payload"


# -------------------------------------------------------- request decodes
# Each golden request is decoded by the real dispatch path; asserts pin
# both the parse and the handler's visible behavior.


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("alpha", 1)
    return f


APIVERSIONS_V0_REQ = bytes.fromhex("0012000000000001000b636f6e666f726d616e6365")
APIVERSIONS_V3_REQ = bytes.fromhex(
    "0012000300000002000b636f6e666f726d616e636500126170616368652d6b61666b612d"
    "6a61766106332e362e3000"
)
METADATA_V1_REQ = bytes.fromhex(
    "0003000100000003000b636f6e666f726d616e6365000000010005616c706861"
)
METADATA_V12_REQ = bytes.fromhex(
    "0003000c00000004000b636f6e666f726d616e63650002000000000000000000000000000"
    "0000006616c70686100000000"
)
PRODUCE_V3_REQ = bytes.fromhex(
    "0000000300000005000b636f6e666f726d616e6365ffffffff00007530000000010005616c"
    "70686100000001000000000000004c0000000000000000000000400000000002c74d696000"
    "00000000000000017e12ef9c000000017e12ef9c00ffffffffffffffffffffffffffff0000"
    "00011c000000066b65790a76616c756500"
)
FETCH_V4_REQ = bytes.fromhex(
    "0001000400000006000b636f6e666f726d616e6365ffffffff0000006400000001001000000"
    "0000000010005616c7068610000000100000000000000000000000000100000"
)
LISTOFFSETS_V1_REQ = bytes.fromhex(
    "0002000100000007000b636f6e666f726d616e6365ffffffff000000010005616c70686100"
    "00000100000000ffffffffffffffff"
)
FINDCOORDINATOR_V0_REQ = bytes.fromhex(
    "000a000000000008000b636f6e666f726d616e636500086d792d67726f7570"
)
HEARTBEAT_V0_REQ = bytes.fromhex(
    "000c000000000009000b636f6e666f726d616e636500086d792d67726f75700000000100086"
    "d656d6265722d31"
)
OFFSETCOMMIT_V2_REQ = bytes.fromhex(
    "000800020000000a000b636f6e666f726d616e636500086d792d67726f75700000000100086"
    "d656d6265722d31ffffffffffffffff000000010005616c70686100000001000000000000000"
    "00000002affff"
)


def test_golden_api_versions_v0(fe):
    req = wire.decode_api_versions_request(APIVERSIONS_V0_REQ)
    assert req.header.api_version == 0
    assert req.header.correlation_id == 1
    assert req.header.client_id == "conformance"
    resp = fe.handle_request(APIVERSIONS_V0_REQ)
    corr, err, apis, _ = wire.decode_api_versions_response(resp, 0)
    assert corr == 1 and err == 0 and len(apis) >= 10


def test_golden_api_versions_v3(fe):
    req = wire.decode_api_versions_request(APIVERSIONS_V3_REQ)
    assert req.client_software_name == "apache-kafka-java"
    assert req.client_software_version == "3.6.0"
    resp = fe.handle_request(APIVERSIONS_V3_REQ)
    corr, err, apis, _ = wire.decode_api_versions_response(resp, 3)
    assert corr == 2 and err == 0


def test_golden_metadata_v1(fe):
    req = wire.decode_metadata_request(METADATA_V1_REQ)
    assert req.topics == ["alpha"]
    resp = fe.handle_request(METADATA_V1_REQ)
    corr, brokers, topics = wire.decode_metadata_response(resp, 1)
    assert corr == 3 and [t[1] for t in topics] == ["alpha"]


def test_golden_metadata_v12(fe):
    req = wire.decode_metadata_request(METADATA_V12_REQ)
    assert req.topics == ["alpha"]
    assert req.topic_ids == [None]  # zero uuid = lookup by name
    assert req.allow_auto_topic_creation is False
    resp = fe.handle_request(METADATA_V12_REQ)
    corr, _, topics = wire.decode_metadata_response(resp, 12)
    assert corr == 4 and topics[0][1] == "alpha" and topics[0][0] == 0


def test_golden_produce_v3_appends(fe):
    resp = fe.handle_request(PRODUCE_V3_REQ)
    corr, results, _ = decode_produce_response(resp, api_version=3)
    assert corr == 5
    [(name, [(idx, err, base, _append_ts)])] = results
    assert (name, idx, err, base) == ("alpha", 0, wire.ERR_NONE, 0)
    assert fe.wire_log.high_watermark("alpha", 0) == 1


def test_golden_fetch_v4_returns_produced_record(fe):
    fe.handle_request(PRODUCE_V3_REQ)
    resp = fe.handle_request(FETCH_V4_REQ)
    corr, results = decode_fetch_response(resp, api_version=4)
    assert corr == 6
    [(name, [(idx, err, hw, batch)])] = results
    assert (name, idx, err, hw) == ("alpha", 0, wire.ERR_NONE, 1)
    _, recs, _ = decode_record_batch(batch)
    assert [(r.key, r.value) for r in recs] == [(b"key", b"value")]


def test_golden_list_offsets_v1(fe):
    fe.handle_request(PRODUCE_V3_REQ)
    resp = fe.handle_request(LISTOFFSETS_V1_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 7  # correlation id
    assert r.int32() == 1  # one topic
    assert r.nullable_string() == "alpha"
    assert r.int32() == 1  # one partition
    assert r.int32() == 0  # partition index
    assert r.int16() == wire.ERR_NONE
    assert r.int64() == -1  # timestamp (v1: -1 for latest query)
    assert r.int64() == 1  # log-end offset after one record


def test_golden_find_coordinator_v0(fe):
    resp = fe.handle_request(FINDCOORDINATOR_V0_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 8
    assert r.int16() == wire.ERR_NONE
    assert r.int32() == 0  # node id: this broker
    assert r.nullable_string() == fe.host
    assert r.int32() == fe.port


def test_golden_offset_commit_v2_then_heartbeat(fe):
    resp = fe.handle_request(OFFSETCOMMIT_V2_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 10
    assert r.int32() == 1  # one topic
    assert r.nullable_string() == "alpha"
    assert r.int32() == 1
    assert r.int32() == 0  # partition
    assert r.int16() == wire.ERR_NONE
    # heartbeat against a group that never joined: GROUP_ID_NOT_FOUND (69)
    resp = fe.handle_request(HEARTBEAT_V0_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 9
    assert r.int16() == 69


# ------------------------------------------- round-3 API golden requests

DELETERECORDS_V1_REQ = bytes.fromhex(
    "001500010000000b000b636f6e666f726d616e6365000000010005616c7068610000000100"
    "000000000000000000000200007530"
)
INITPRODUCERID_V0_REQ = bytes.fromhex(
    "001600000000000c000b636f6e666f726d616e6365ffff0000ea60"
)
ENDTXN_V0_REQ = bytes.fromhex(
    "001a00000000000d000b636f6e666f726d616e6365000474782d310000000000000000000001"
)
DESCRIBECONFIGS_V0_REQ = bytes.fromhex(
    "002000000000000e000b636f6e666f726d616e636500000001020005616c706861ffffffff"
)
LISTOFFSETS_V5_REQ = bytes.fromhex(
    "000200050000000f000b636f6e666f726d616e6365ffffffff00000000010005616c706861"
    "0000000100000000fffffffffffffffffffffffe"
)


def test_golden_delete_records_v1(fe):
    fe.handle_request(PRODUCE_V3_REQ)  # offsets 0
    fe.handle_request(PRODUCE_V3_REQ.replace(b"\x00\x00\x00\x05", b"\x00\x00\x00\x15", 1))
    fe.wire_log.append("alpha", 0, [])  # no-op, keeps state simple
    resp = fe.handle_request(DELETERECORDS_V1_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 11
    assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.nullable_string() == "alpha"
    assert r.int32() == 1
    assert r.int32() == 0  # partition
    assert r.int64() == 2  # new low watermark
    assert r.int16() == wire.ERR_NONE
    assert fe.wire_log.log_start("alpha", 0) == 2


def test_golden_init_producer_id_v0(fe):
    resp = fe.handle_request(INITPRODUCERID_V0_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 12
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE
    assert r.int64() == 0  # first pid
    assert r.int16() == 0  # epoch


def test_golden_end_txn_v0_without_txn(fe):
    # no InitProducerId for "tx-1" → pid 0 has epoch -1 → fenced
    resp = fe.handle_request(ENDTXN_V0_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 13
    assert r.int32() == 0
    assert r.int16() == 47  # INVALID_PRODUCER_EPOCH


def test_golden_describe_configs_v0(fe):
    fe.wire_log.topic_configs["alpha"] = {"retention.ms": "1000"}
    resp = fe.handle_request(DESCRIBECONFIGS_V0_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 14
    r.int32()
    assert r.int32() == 1
    assert r.int16() == wire.ERR_NONE
    r.nullable_string()
    assert r.int8() == 2 and r.nullable_string() == "alpha"
    assert r.int32() == 1
    assert r.nullable_string() == "retention.ms"
    assert r.nullable_string() == "1000"


def test_golden_list_offsets_v5_earliest(fe):
    fe.handle_request(PRODUCE_V3_REQ)
    resp = fe.handle_request(LISTOFFSETS_V5_REQ)
    r = wire.Reader(resp)
    assert r.int32() == 15
    assert r.int32() == 0  # throttle (v2+)
    assert r.int32() == 1
    assert r.nullable_string() == "alpha"
    assert r.int32() == 1
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE
    assert r.int64() == -1  # ts
    assert r.int64() == 0  # earliest
    assert r.int32() == 0  # leader_epoch (v4+)


# -------------------------------------------------------- SASL (17 / 36)
# SaslHandshake v1 request, assembled field-by-field per spec:
#   header v1: api_key=17 version=1 corr=33 client_id="conf"
#   body: mechanism STRING "PLAIN"
SASL_HANDSHAKE_V1_REQ = bytes.fromhex(
    "00110001" "00000021" "0004" "636f6e66" "0005" "504c41494e"
)
# expected response bytes (header v0): corr, error_code=0,
# mechanisms ARRAY[STRING] = ["PLAIN"]
SASL_HANDSHAKE_V1_RESP = bytes.fromhex(
    "00000021" "0000" "00000001" "0005" "504c41494e"
)

# SaslAuthenticate v1 request: header v1 (key=36 v=1 corr=34
# client="conf"), body auth_bytes = RFC 4616 PLAIN token
# "\0alice\0wonderland" (len 17)
SASL_AUTH_V1_REQ = bytes.fromhex(
    "00240001" "00000022" "0004" "636f6e66"
    "00000011" "00" "616c696365" "00" "776f6e6465726c616e64"
)
# expected response: corr, error=0, error_message=null(ffff),
# auth_bytes empty (len 0), session_lifetime_ms int64 = 0
SASL_AUTH_V1_RESP = bytes.fromhex(
    "00000022" "0000" "ffff" "00000000" "0000000000000000"
)


def test_golden_sasl_plain_flow_exact_bytes():
    from kcore_spark.protocol.auth import SaslState

    fe = KafkaFrontend(credentials={"alice": "wonderland"})
    st = SaslState()
    resp1 = fe.handle_request(SASL_HANDSHAKE_V1_REQ, sasl=st)
    assert resp1 == SASL_HANDSHAKE_V1_RESP
    resp2 = fe.handle_request(SASL_AUTH_V1_REQ, sasl=st)
    assert resp2 == SASL_AUTH_V1_RESP
    assert st.authenticated and st.authorization_id == "alice"


# ------------------------------- ConsumerGroupDescribe v0/v1 (KIP-848)
# Spec-derived request bytes (flexible; v1 request body = v0):
#   api_key=69, version, corr=42, client_id "cli", tagged;
#   groups=["g"], include_authorized_operations=false, tagged.
CGDESCRIBE_V0_REQ = bytes.fromhex("004500000000002a0003636c6900020267" "0000")
CGDESCRIBE_V1_REQ = bytes.fromhex("004500010000002a0003636c6900020267" "0000")

# Expected response for a group this coordinator has never seen —
# derived from the ConsumerGroupDescribeResponse schema, not from the
# implementation: corr, header tagged, throttle, groups[1]:
# err=69 GROUP_ID_NOT_FOUND, message, gid, state "Dead", epochs 0/0,
# assignor "", members[0], authorized_operations INT32_MIN, tagged ×2.
_CGD_MISSING = (
    "0000002a"  # correlation id
    "00"        # response header v1 tagged fields
    "00000000"  # throttle_time_ms
    "02"        # groups: compact len 1
    "0045"      # error_code 69
    "14" + "group 'g' not found".encode().hex()  # compact error_message
    + "0267"        # group_id "g"
    "05" + "Dead".encode().hex()
    + "00000000"  # group_epoch
    "00000000"  # assignment_epoch
    "01"        # assignor_name ""
    "01"        # members: compact len 0
    "80000000"  # authorized_operations: INT32_MIN (not requested)
    "00"        # group tagged fields
    "00"        # response tail tagged fields
)


def test_golden_consumer_group_describe_missing_group(fe):
    # with zero members, v1's only schema delta (per-member MemberType)
    # vanishes: both versions must produce the identical golden bytes
    assert fe.handle_request(CGDESCRIBE_V0_REQ).hex() == _CGD_MISSING
    assert fe.handle_request(CGDESCRIBE_V1_REQ).hex() == _CGD_MISSING


def test_describe_v1_adds_exactly_one_byte_per_member(fe):
    """Schema pin independent of decode logic: MemberType int8 is the
    ONLY v0→v1 delta, so for any group state the v1 response is exactly
    n_members bytes longer than v0."""
    from tests.test_consumer_group_848 import _hb

    _hb(fe, subs=("ta",))
    _hb(fe, subs=("ta",))  # second member
    w0 = wire.Writer()
    w0.int16(69).int16(0).int32(7)
    w0.nullable_string("cli")
    w0.empty_tagged_fields()
    w0.compact_array_len(1)
    w0.compact_string("g848")
    w0.bool_(False)
    w0.empty_tagged_fields()
    v0 = fe.handle_request(w0.bytes())
    w1 = wire.Writer()
    w1.int16(69).int16(1).int32(7)
    w1.nullable_string("cli")
    w1.empty_tagged_fields()
    w1.compact_array_len(1)
    w1.compact_string("g848")
    w1.bool_(False)
    w1.empty_tagged_fields()
    v1 = fe.handle_request(w1.bytes())
    assert len(v1) == len(v0) + 2  # two members → two MemberType bytes

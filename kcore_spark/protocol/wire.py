"""Kafka binary wire codec (the subset the engine speaks).

Hand-rolled big-endian codecs for the Kafka protocol primitives
(INT16/32, NULLABLE_STRING, COMPACT_STRING, UNSIGNED_VARINT, tagged
fields) and the ApiVersions request/response in versions 0-3.

Reference parity (all citations into /root/reference/):
- Frame = 4-byte BE size + payload: `pkg/kafka/kafka_connectian_handler.go:66-95`.
- Request header decode → (api_key, api_version, correlation_id,
  client_id): the sarama-fork decode at `pkg/kafka/kafka_api.go:54-63`.
- ApiVersions (key 18, v3) advertising the supported range:
  `pkg/kafka/kafka_api.go:106-125`, constants `pkg/kafka/versions.go:20-25`.
- Correlation-ID echo: `pkg/kafka/kafka_api.go:100`.

The reference kills the connection on an unknown API key
(`kafka_api.go:95-96`); real Kafka answers ApiVersions version
mismatches with UNSUPPORTED_VERSION (error 35) and a v0 body — we
follow Kafka (SURVEY §3.4 calls this out as a deliberate deviation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

API_VERSIONS_KEY = 18
METADATA_KEY = 3
PRODUCE_KEY = 0
FETCH_KEY = 1
LIST_OFFSETS_KEY = 2
CREATE_TOPICS_KEY = 19
DELETE_TOPICS_KEY = 20
JOIN_GROUP_KEY = 11
HEARTBEAT_KEY = 12
LEAVE_GROUP_KEY = 13
SYNC_GROUP_KEY = 14
OFFSET_COMMIT_KEY = 8
OFFSET_FETCH_KEY = 9
FIND_COORDINATOR_KEY = 10
ERR_NONE = 0
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_CORRUPT_MESSAGE = 2
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNSUPPORTED_VERSION = 35

# (api_key, min_version, max_version) advertised by this broker.
SUPPORTED_APIS: tuple[tuple[int, int, int], ...] = (
    (PRODUCE_KEY, 3, 6),
    (FETCH_KEY, 4, 4),
    (LIST_OFFSETS_KEY, 1, 1),
    (METADATA_KEY, 0, 1),
    (OFFSET_COMMIT_KEY, 2, 2),
    (OFFSET_FETCH_KEY, 1, 1),
    (FIND_COORDINATOR_KEY, 0, 0),
    (JOIN_GROUP_KEY, 0, 0),
    (HEARTBEAT_KEY, 0, 0),
    (LEAVE_GROUP_KEY, 0, 0),
    (SYNC_GROUP_KEY, 0, 0),
    (CREATE_TOPICS_KEY, 0, 0),
    (DELETE_TOPICS_KEY, 0, 0),
    (API_VERSIONS_KEY, 0, 3),
)


class Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise EOFError(f"short read: need {n} at {self.pos}, have {len(self.buf)}")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def int16(self) -> int:
        return struct.unpack(">h", self.read(2))[0]

    def int32(self) -> int:
        return struct.unpack(">i", self.read(4))[0]

    def int64(self) -> int:
        return struct.unpack(">q", self.read(8))[0]

    def int8(self) -> int:
        return self.read(1)[0]

    def nullable_bytes(self) -> bytes | None:
        n = self.int32()
        if n == -1:
            return None
        return self.read(n)

    def nullable_string(self) -> str | None:
        n = self.int16()
        if n == -1:
            return None
        return self.read(n).decode("utf-8")

    def unsigned_varint(self) -> int:
        shift = 0
        result = 0
        while True:
            b = self.read(1)[0]
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def compact_string(self) -> str | None:
        n = self.unsigned_varint()
        if n == 0:
            return None
        return self.read(n - 1).decode("utf-8")

    def tagged_fields(self) -> None:
        count = self.unsigned_varint()
        for _ in range(count):
            self.unsigned_varint()  # tag
            size = self.unsigned_varint()
            self.read(size)


class Writer:
    def __init__(self) -> None:
        self.parts: list[bytes] = []

    def raw(self, b: bytes) -> "Writer":
        self.parts.append(b)
        return self

    def int16(self, v: int) -> "Writer":
        return self.raw(struct.pack(">h", v))

    def int32(self, v: int) -> "Writer":
        return self.raw(struct.pack(">i", v))

    def int64(self, v: int) -> "Writer":
        return self.raw(struct.pack(">q", v))

    def int8(self, v: int) -> "Writer":
        return self.raw(bytes([v & 0xFF]))

    def nullable_bytes(self, b: bytes | None) -> "Writer":
        if b is None:
            return self.int32(-1)
        return self.int32(len(b)).raw(b)

    def nullable_string(self, s: str | None) -> "Writer":
        if s is None:
            return self.int16(-1)
        b = s.encode("utf-8")
        return self.int16(len(b)).raw(b)

    def unsigned_varint(self, v: int) -> "Writer":
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.raw(bytes([b | 0x80]))
            else:
                return self.raw(bytes([b]))

    def compact_string(self, s: str | None) -> "Writer":
        if s is None:
            return self.unsigned_varint(0)
        b = s.encode("utf-8")
        return self.unsigned_varint(len(b) + 1).raw(b)

    def compact_array_len(self, n: int) -> "Writer":
        return self.unsigned_varint(n + 1)

    def empty_tagged_fields(self) -> "Writer":
        return self.unsigned_varint(0)

    def bytes(self) -> bytes:
        return b"".join(self.parts)


@dataclass
class RequestHeader:
    api_key: int
    api_version: int
    correlation_id: int
    client_id: str | None


def decode_request_header(r: Reader, flexible: bool) -> RequestHeader:
    """Header v1 (rigid) / v2 (flexible, trailing tagged fields)."""
    h = RequestHeader(r.int16(), r.int16(), r.int32(), None)
    h.client_id = r.nullable_string()
    if flexible:
        r.tagged_fields()
    return h


def is_flexible_request(api_key: int, api_version: int) -> bool:
    """Flexible (compact/tagged) encoding cutover per API key."""
    if api_key == API_VERSIONS_KEY:
        return api_version >= 3
    if api_key == METADATA_KEY:
        return api_version >= 9
    return False


# ------------------------------------------------------ ApiVersions


@dataclass
class ApiVersionsRequest:
    header: RequestHeader
    client_software_name: str | None = None
    client_software_version: str | None = None


def decode_api_versions_request(payload: bytes) -> ApiVersionsRequest:
    r = Reader(payload)
    flexible = False
    # peek api_key/version to pick header flavor
    api_key = struct.unpack(">h", payload[0:2])[0]
    api_version = struct.unpack(">h", payload[2:4])[0]
    flexible = is_flexible_request(api_key, api_version)
    h = decode_request_header(r, flexible)
    req = ApiVersionsRequest(h)
    if h.api_version >= 3 and r.pos < len(r.buf):
        req.client_software_name = r.compact_string()
        req.client_software_version = r.compact_string()
        r.tagged_fields()
    return req


def encode_api_versions_response(
    correlation_id: int,
    api_version: int,
    error_code: int = ERR_NONE,
    apis: tuple[tuple[int, int, int], ...] = SUPPORTED_APIS,
) -> bytes:
    """ApiVersions response v0-v3. NB: the response header is always
    v0 (no tagged fields) for ApiVersions — clients must be able to
    parse the error path before knowing the negotiated version."""
    w = Writer()
    w.int32(correlation_id)
    w.int16(error_code)
    if api_version >= 3:
        w.compact_array_len(len(apis))
        for key, lo, hi in apis:
            w.int16(key).int16(lo).int16(hi).empty_tagged_fields()
        w.int32(0)  # throttle_time_ms
        w.empty_tagged_fields()
    else:
        w.int32(len(apis))
        for key, lo, hi in apis:
            w.int16(key).int16(lo).int16(hi)
        if api_version >= 1:
            w.int32(0)  # throttle_time_ms
    return w.bytes()


def decode_api_versions_response(payload: bytes, api_version: int):
    """Client-side decode (used by tests as the behavioral oracle)."""
    r = Reader(payload)
    correlation_id = r.int32()
    error_code = r.int16()
    apis = []
    if api_version >= 3:
        n = r.unsigned_varint() - 1
        for _ in range(n):
            apis.append((r.int16(), r.int16(), r.int16()))
            r.tagged_fields()
        throttle = r.int32()
        r.tagged_fields()
    else:
        n = r.int32()
        for _ in range(n):
            apis.append((r.int16(), r.int16(), r.int16()))
        throttle = r.int32() if api_version >= 1 else 0
    return correlation_id, error_code, apis, throttle


# ------------------------------------------------------ Metadata (v0/v1)


def encode_metadata_response(
    correlation_id: int,
    api_version: int,
    host: str,
    port: int,
    topics: list[tuple[str, int]],
) -> bytes:
    """Metadata response v0/v1: single-broker cluster (node 0), topics
    from the TopicLog catalog, every partition led by node 0."""
    w = Writer()
    w.int32(correlation_id)
    w.int32(1)  # brokers: 1
    w.int32(0)  # node_id
    w.nullable_string(host)
    w.int32(port)
    if api_version >= 1:
        w.nullable_string(None)  # rack
    if api_version >= 1:
        w.int32(0)  # controller_id
    w.int32(len(topics))
    for name, n_parts in topics:
        w.int16(ERR_NONE)
        w.nullable_string(name)
        if api_version >= 1:
            w.raw(b"\x00")  # is_internal: false
        w.int32(n_parts)
        for p in range(n_parts):
            w.int16(ERR_NONE)
            w.int32(p)
            w.int32(0)  # leader = node 0
            w.int32(1)  # replicas
            w.int32(0)
            w.int32(1)  # isr
            w.int32(0)
    return w.bytes()

"""Spec-derived golden bytes for the pure-Python Avro binary codec
(operators/avro_codec.py) — the same stance as the Kafka wire-format
golden bytes: with no Avro Python library in the container, the
encoding is pinned directly against the Avro specification's "Binary
Encoding" examples (zig-zag longs, length-prefixed strings, unions),
plus property round-trips via hypothesis."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.operators.avro_codec import (
    decode_record,
    encode_record,
    read_long,
    write_long,
)


def _long_bytes(n: int) -> bytes:
    out = bytearray()
    write_long(n, out)
    return bytes(out)


def test_spec_long_examples():
    # the exact table from the Avro spec's binary-encoding section
    assert _long_bytes(0) == bytes([0x00])
    assert _long_bytes(-1) == bytes([0x01])
    assert _long_bytes(1) == bytes([0x02])
    assert _long_bytes(-2) == bytes([0x03])
    assert _long_bytes(2) == bytes([0x04])
    assert _long_bytes(-64) == bytes([0x7F])
    assert _long_bytes(64) == bytes([0x80, 0x01])
    assert _long_bytes(8192) == bytes([0x80, 0x80, 0x01])
    assert _long_bytes(-8193) == bytes([0x81, 0x80, 0x01])


def test_spec_string_example():
    # spec: string "foo" encodes as 06 66 6f 6f
    assert encode_record(["foo"], [("s", "string")]) == bytes([0x06, 0x66, 0x6F, 0x6F])


def test_union_null_and_value_branches():
    sch = [("v", "null_or_double")]
    # null = union index 0 (zigzag varint 00), no payload
    assert encode_record([None], sch) == bytes([0x00])
    # value = union index 1 (zigzag varint 02) + 8-byte LE double
    enc = encode_record([1.5], sch)
    assert enc[:1] == bytes([0x02]) and enc[1:] == struct.pack("<d", 1.5)


def test_boolean_and_bytes():
    assert encode_record([True, False], [("a", "boolean"), ("b", "boolean")]) == bytes(
        [0x01, 0x00]
    )
    assert encode_record([b"\x01\x02"], [("b", "bytes")]) == bytes([0x04, 0x01, 0x02])


def test_record_roundtrip_mixed():
    sch = [
        ("event_id", "long"),
        ("event_type", "string"),
        ("value", "null_or_double"),
        ("flag", "boolean"),
    ]
    for row in [
        (0, "", None, False),
        (123456789, "purchase", 3.14159, True),
        (-5, "aé☃", -0.0, False),  # multibyte UTF-8
    ]:
        assert decode_record(encode_record(row, sch), sch) == row


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip_property(n):
    v, pos = read_long(_long_bytes(n), 0)
    assert v == n and pos == len(_long_bytes(n))


@settings(max_examples=200)
@given(
    st.integers(min_value=0, max_value=2**40),
    st.text(max_size=50),
    st.one_of(st.none(), st.floats(allow_nan=False)),
)
def test_event_record_roundtrip_property(eid, etype, value):
    sch = [("event_id", "long"), ("event_type", "string"), ("value", "null_or_double")]
    enc = encode_record((eid, etype, value), sch)
    assert decode_record(enc, sch) == (eid, etype, value)


def test_payload_length_formula_matches_oracle_arithmetic():
    """The q_avro_payload_decode oracle recomputes LENGTH(payload)
    arithmetically; pin that formula against real encoded bytes across
    the varint width boundaries."""
    sch = [("event_id", "long"), ("event_type", "string"), ("value", "null_or_double")]
    for eid in [0, 63, 64, 8191, 8192, 1048575, 1048576, 134217727, 134217728]:
        for et in ["view", "purchase"]:
            for v in [None, 2.5]:
                enc = encode_record((eid, et, v), sch)
                z = 2 * eid
                vb = 1 if z < 128 else 2 if z < 16384 else 3 if z < 2097152 else (
                    4 if z < 268435456 else 5
                )
                expect = vb + 1 + len(et) + 1 + (0 if v is None else 8)
                assert len(enc) == expect, (eid, et, v)

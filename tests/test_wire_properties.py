"""Property-based wire-codec guarantees (hypothesis): primitive
round-trips for every Reader/Writer pair, and randomized dispatch
robustness across the full advertised (api_key, version) surface —
arbitrary bodies may yield an error response or a close, never an
exception."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.protocol import wire

# ------------------------------------------------ primitive round-trips

text = st.text(max_size=80)
maybe_text = st.one_of(st.none(), text)
maybe_bytes = st.one_of(st.none(), st.binary(max_size=80))


@given(maybe_text, maybe_bytes, st.integers(-1, 1000), st.binary(min_size=16, max_size=16), st.booleans())
def test_rigid_primitives_roundtrip(s, b, n, u, flag):
    w = wire.Writer()
    w.nullable_string(s).nullable_bytes(b).int32(n).uuid(u).bool_(flag)
    r = wire.Reader(w.bytes())
    assert r.nullable_string() == s
    assert r.nullable_bytes() == b
    assert r.int32() == n
    assert r.uuid() == u
    assert r.bool_() is flag
    assert r.pos == len(r.buf)  # no trailing bytes


@given(maybe_text, maybe_bytes, st.integers(-1, 1000))
def test_compact_primitives_roundtrip(s, b, n):
    w = wire.Writer()
    w.compact_string(s).compact_bytes(b).compact_array_len(n)
    w.empty_tagged_fields()
    r = wire.Reader(w.bytes())
    assert r.compact_string() == s
    assert r.compact_bytes() == b
    assert r.compact_array_len() == n
    r.tagged_fields()
    assert r.pos == len(r.buf)


@given(st.integers(-(2**31), 2**31 - 1), st.integers(-(2**63), 2**63 - 1), st.integers(-(2**15), 2**15 - 1))
def test_fixed_ints_roundtrip(i32, i64, i16):
    w = wire.Writer()
    w.int32(i32).int64(i64).int16(i16)
    r = wire.Reader(w.bytes())
    assert (r.int32(), r.int64(), r.int16()) == (i32, i64, i16)


@given(text)
def test_compact_string_length_is_varint_of_utf8_plus_one(s):
    """The compact encoding's length prefix counts UTF-8 BYTES + 1 —
    a unicode string whose char count differs from its byte count must
    still round-trip (regression guard for len(str) vs len(bytes))."""
    w = wire.Writer()
    w.compact_string(s)
    r = wire.Reader(w.bytes())
    assert r.unsigned_varint() == len(s.encode("utf-8")) + 1
    r2 = wire.Reader(w.bytes())
    assert r2.compact_string() == s


# ------------------------------------------------ randomized dispatch

_ADVERTISED = [
    (key, v) for key, lo, hi in wire.SUPPORTED_APIS for v in range(lo, hi + 1)
]


@settings(max_examples=300, deadline=None)
@given(
    st.sampled_from(_ADVERTISED),
    st.binary(max_size=64),
)
def test_random_bodies_never_crash_dispatch(key_version, body):
    from kcore_spark.protocol.server import KafkaFrontend

    key, version = key_version
    fe = _shared_frontend()
    payload = struct.pack(">hhi", key, version, 7) + b"\x00\x03fuz" + body
    try:
        fe.handle_request(payload)
    except Exception as e:  # noqa: BLE001 - the property under test
        raise AssertionError(
            f"api {key} v{version} crashed on body {body!r}: {e!r}"
        ) from e


_FE = None


def _shared_frontend():
    # one frontend across examples: state accumulated by earlier random
    # requests makes later examples strictly more adversarial
    global _FE
    if _FE is None:
        from kcore_spark.protocol.server import KafkaFrontend

        _FE = KafkaFrontend()
        _FE.wire_log.create_topic("t", 1)
    return _FE

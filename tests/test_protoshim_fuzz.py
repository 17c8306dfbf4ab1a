"""Malformed-frame fuzz for the vendored protobuf shim (r11 VERDICT #3).

The shim sits under every transformWithState query: PySpark's
StatefulProcessorApiClient parses StateResponse* frames coming back
from the JVM state server with ParseFromString. A wedged or
version-skewed state server can hand the client ANY bytes, so the
decode path must FAIL CLOSED: every parse of a malformed frame either
succeeds as a (valid) proto or raises google.protobuf.message.
DecodeError — never UnicodeDecodeError / struct.error / MemoryError /
AttributeError, and never a "successful" parse whose internal state a
later SerializeToString chokes on.

Fail-open vectors this suite pinned when introduced (all fixed in
_runtime.py):
- fixed32/fixed64 fields sliced without a bounds check → short buffer
  reached struct.unpack → struct.error;
- wire-type mismatch on a message field delivered a varint INT to
  MergeFromString → bytes(n) zero-allocation (memory bomb for large n);
- wire-type mismatch on a string/repeated field stored an int that a
  later serialize raised AttributeError on (corrupt state);
- invalid UTF-8 in a proto3 string field → raw UnicodeDecodeError.

Mutation model: seeded deterministic random (no flaky reruns) — byte
flips, truncations, random splices, tag rewrites — over a corpus of
every frame shape the transformWithState client sends or receives,
plus hand-crafted adversarial frames for each vector above.
"""

from __future__ import annotations

import random

import pytest

from kcore_spark.vendor import ensure_protobuf

assert ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402
from google.protobuf import message as pb_message  # noqa: E402

DecodeError = pb_message.DecodeError


def _corpus() -> list[tuple[type, bytes]]:
    """(message class, canonical valid frame) for every shape the
    state-server bridge exchanges."""
    frames = [
        sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.CREATED)
            )
        ),
        sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                valueStateCall=sm.ValueStateCall(
                    stateName="session", exists=sm.Exists()
                )
            )
        ),
        sm.StateRequest(
            utilsRequest=sm.UtilsRequest(
                parseStringSchema=sm.ParseStringSchema(schema="a int, b string")
            )
        ),
        sm.StateResponse(statusCode=3, value=b"\x01\x02\x03", errorMessage="boom"),
        sm.StateResponseWithLongTypeVal(statusCode=0, value=-(2**62)),
        sm.StateResponseWithMapKeysOrValues(
            value=[b"a", b"", b"ccc" * 40], requireNextFetch=True
        ),
        sm.StateResponseWithMapIterator(
            kvPair=[
                sm.KeyAndValuePair(key=b"k1", value=b"v1"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2" * 100),
            ],
            requireNextFetch=False,
        ),
    ]
    return [(type(m), m.SerializeToString()) for m in frames]


def _mutants(rng: random.Random, frame: bytes, n: int):
    """Deterministic malformed variants of one valid frame."""
    for _ in range(n):
        kind = rng.randrange(5)
        b = bytearray(frame)
        if kind == 0 and b:  # flip 1-4 bytes
            for _ in range(rng.randint(1, 4)):
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
        elif kind == 1 and b:  # truncate anywhere
            b = b[: rng.randrange(len(b))]
        elif kind == 2:  # splice random garbage in
            i = rng.randrange(len(b) + 1)
            b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 12)))
        elif kind == 3 and b:  # rewrite a tag byte entirely
            i = rng.randrange(len(b))
            b[i] = rng.randrange(256)
        else:  # pure random bytes
            b = bytearray(rng.randrange(256) for _ in range(rng.randint(0, 40)))
        yield bytes(b)


def _assert_fails_closed(cls, data: bytes):
    msg = cls()
    try:
        msg.ParseFromString(data)
    except DecodeError:
        return  # fail closed: the one permitted failure mode
    except Exception as e:  # noqa: BLE001 - the regression under test
        pytest.fail(
            f"{cls.__name__}.ParseFromString leaked {type(e).__name__}: {e!r} "
            f"on frame {data.hex()}"
        )
    # parse "succeeded": the resulting state must be serializable —
    # a parse that stores a type-confused value and only explodes on
    # the next serialize is corrupt state, not success
    try:
        msg.SerializeToString()
    except Exception as e:  # noqa: BLE001
        pytest.fail(
            f"{cls.__name__} accepted frame {data.hex()} but serialize "
            f"raised {type(e).__name__}: {e!r} (corrupt state)"
        )


def test_seeded_mutation_fuzz_fails_closed():
    rng = random.Random(0xC0FFEE)
    n_checked = 0
    for cls, frame in _corpus():
        for mutant in _mutants(rng, frame, 400):
            _assert_fails_closed(cls, mutant)
            n_checked += 1
    assert n_checked == 400 * len(_corpus())


def test_cross_shape_confusion_fails_closed():
    """Every valid frame parsed as every OTHER shape (the realistic
    version-skew failure: response type mismatch on the socket)."""
    corpus = _corpus()
    for cls, _ in corpus:
        for _, frame in corpus:
            _assert_fails_closed(cls, frame)


def test_wire_type_mismatch_on_message_field_is_skipped_not_allocated():
    """field 2 of StateRequest is a message (LEN); deliver it as a
    varint carrying 2^40 — the old decode handed that int to
    MergeFromString, whose bytes(n) zero-allocated a terabyte."""
    evil = bytes([2 << 3 | 0]) + b"\x80\x80\x80\x80\x80\x80\x01"  # varint 2^42
    msg = sm.StateRequest()
    msg.ParseFromString(evil)  # must skip as unknown, instantly
    assert msg.WhichOneof("method") is None
    assert msg.SerializeToString() == b""


def test_wire_type_mismatch_on_string_field_never_corrupts_state():
    """stateName (field 1, string) delivered as a varint must not store
    an int that a later serialize chokes on."""
    evil = bytes([1 << 3 | 0, 42])  # field 1 as varint 42
    msg = sm.ValueStateCall()
    msg.ParseFromString(evil)
    assert msg.stateName == ""  # untouched default
    msg.SerializeToString()


def test_invalid_utf8_in_string_field_is_decode_error():
    # valid LEN framing, invalid UTF-8 payload for ParseStringSchema.schema
    payload = b"\xff\xfe\x80"
    evil = bytes([1 << 3 | 2, len(payload)]) + payload
    with pytest.raises(DecodeError):
        sm.ParseStringSchema().ParseFromString(evil)


def test_truncated_length_and_fixed_fields_are_decode_errors():
    # LEN header claiming 100 bytes with 2 present
    with pytest.raises(DecodeError):
        sm.StateResponse().ParseFromString(bytes([2 << 3 | 2, 100]) + b"ab")
    # a 64-bit wire-type tag with 3 trailing bytes (truncated fixed64) —
    # unknown field number, but the frame itself is unparseable
    with pytest.raises(DecodeError):
        sm.StateResponse().ParseFromString(bytes([7 << 3 | 1]) + b"abc")
    # truncated varint (continuation bit on the last byte)
    with pytest.raises(DecodeError):
        sm.StateResponse().ParseFromString(bytes([1 << 3 | 0, 0x80]))
    # oversized varint (>10 bytes of continuation)
    with pytest.raises(DecodeError):
        sm.StateResponse().ParseFromString(bytes([1 << 3 | 0]) + b"\x80" * 11)


def test_huge_declared_length_fails_fast_without_allocation():
    """A LEN varint declaring 2^61 bytes must raise DecodeError from the
    bounds check, not attempt the slice/allocation."""
    import time

    evil = bytes([2 << 3 | 2]) + b"\x80\x80\x80\x80\x80\x80\x80\x80\x20" + b"xx"
    t0 = time.monotonic()
    with pytest.raises(DecodeError):
        sm.StateRequest().ParseFromString(evil)
    assert time.monotonic() - t0 < 1.0


def test_valid_frames_still_roundtrip_after_hardening():
    """The hardening must not reject anything legitimate: every corpus
    frame parses into an equal message."""
    for cls, frame in _corpus():
        msg = cls()
        msg.ParseFromString(frame)
        assert msg.SerializeToString() == frame

"""Vendored protobuf shim (kcore_spark/vendor/protoshim) contract tests.

The shim exists so PySpark's generated ``StateMessage_pb2`` module —
and therefore the transformWithStateInPandas Python<->JVM state
bridge — runs without the protobuf wheel. These tests pin:

1. the generated module imports and builds its classes through the
   shim's descriptor-pool / builder path;
2. wire-format round-trips for every request shape PySpark's
   StatefulProcessorApiClient constructs, and every response shape it
   parses (StateResponse*, repeated bytes / messages, negative int64);
3. proto3 presence semantics the JVM depends on: empty submessages in
   a oneof still serialize (the JVM dispatches on the set oneof arm),
   default scalars don't;
4. varint edge cases via hypothesis.

If a REAL protobuf wheel is ever installed it takes precedence
(kcore_spark.vendor.ensure_protobuf) and these tests then exercise the
real runtime — the assertions are implementation-agnostic.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.vendor import ensure_protobuf

assert ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def roundtrip(msg):
    out = type(msg)()
    out.ParseFromString(msg.SerializeToString())
    return out


def test_import_and_enum_constants():
    # builder published enum value constants at module scope
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.INITIALIZED == 2
    assert sm.DATA_PROCESSED == 3
    assert sm.TIMER_PROCESSED == 4
    assert sm.CLOSED == 5


def test_set_handle_state_request():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    data = req.SerializeToString()
    # canonical bytes: field2(LEN){field1(LEN){field1(varint)=1}}
    assert data == bytes.fromhex("12040a020801")
    back = roundtrip(req)
    assert back.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_empty_submessage_in_oneof_serializes():
    # JVM dispatches on the oneof arm, so Exists() must hit the wire
    # even though it has zero fields.
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(valueStateCall=call)
    )
    data = req.SerializeToString()
    back = roundtrip(req)
    assert back.stateVariableRequest.valueStateCall.stateName == "s"
    # the exists arm is present on the parsed message
    assert back.stateVariableRequest.valueStateCall.HasField("exists")
    assert b"\x12\x00" in data  # field 2 (exists), zero length


def test_default_scalar_skipped_on_wire():
    # proto3 implicit presence: statusCode=0 must not serialize
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    assert sm.StateResponse(statusCode=1).SerializeToString() != b""


def test_attribute_assignment_and_ttl_vivify():
    cmd = sm.StateCallCommand()
    cmd.stateName = "sess"
    cmd.schema = "start long, last long, n long"
    cmd.ttl.durationMs = 60000
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = roundtrip(req)
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "sess"
    assert got.schema == "start long, last long, n long"
    assert got.ttl.durationMs == 60000


def test_timer_request_roundtrip():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            timerStateCall=sm.TimerStateCallCommand(
                register=sm.RegisterTimer(expiryTimestampMs=1723672800123)
            )
        )
    )
    back = roundtrip(req)
    call = back.statefulProcessorCall.timerStateCall
    assert call.register.expiryTimestampMs == 1723672800123


def test_implicit_key_request():
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01pickled\xff")
        )
    )
    back = roundtrip(req)
    assert back.implicitGroupingKeyRequest.setImplicitKey.key == b"\x00\x01pickled\xff"


def test_response_negative_long():
    # watermark responses use -1 sentinel: 10-byte two's-complement varint
    msg = sm.StateResponseWithLongTypeVal(statusCode=0, value=-1)
    data = msg.SerializeToString()
    assert roundtrip(msg).value == -1
    assert len(data) >= 11  # tag + 10-byte varint


def test_response_repeated_bytes_and_bool():
    msg = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"", b"ccc"], requireNextFetch=True
    )
    back = roundtrip(msg)
    assert list(back.value) == [b"a", b"", b"ccc"]
    assert back.requireNextFetch is True
    # absent repeated reads as empty, absent bool as False
    empty = sm.StateResponseWithListGet()
    assert list(empty.value) == []
    assert empty.requireNextFetch is False


def test_response_repeated_message_kvpair_and_timers():
    msg = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2"),
        ],
        requireNextFetch=False,
    )
    back = roundtrip(msg)
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b""),
    ]
    timers = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=b"u7", timestampMs=99), sm.TimerInfo(timestampMs=-5)],
    )
    back2 = roundtrip(timers)
    assert [(t.key, t.timestampMs) for t in back2.timer] == [(b"u7", 99), (b"", -5)]


def test_oneof_last_set_wins():
    req = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            timerValueRequest=sm.TimerValueRequest(getWatermark=sm.GetWatermark())
        )
    )
    # setting another arm of the same oneof clears the first
    req2 = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            timerValueRequest=sm.TimerValueRequest(
                getProcessingTimer=sm.GetProcessingTime()
            )
        )
    )
    tv1 = roundtrip(req).timerRequest.timerValueRequest
    tv2 = roundtrip(req2).timerRequest.timerValueRequest
    assert tv1.HasField("getWatermark") and not tv1.HasField("getProcessingTimer")
    assert tv2.HasField("getProcessingTimer") and not tv2.HasField("getWatermark")


def test_unknown_fields_skipped():
    # a future JVM may add fields; parser must skip unknown numbers
    base = sm.StateResponse(statusCode=7, errorMessage="x").SerializeToString()
    # append unknown field 15 (varint) and field 14 (len-delimited)
    extra = base + bytes([15 << 3]) + b"\x2a" + bytes([(14 << 3) | 2, 3]) + b"abc"
    msg = sm.StateResponse()
    msg.ParseFromString(extra)
    assert msg.statusCode == 7 and msg.errorMessage == "x"


def test_parse_string_schema_request():
    req = sm.StateRequest(
        utilsRequest=sm.UtilsRequest(
            parseStringSchema=sm.ParseStringSchema(schema="a int, b string")
        )
    )
    back = roundtrip(req)
    assert back.utilsRequest.parseStringSchema.schema == "a int, b string"


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int64_varint_roundtrip(v):
    msg = sm.StateResponseWithLongTypeVal(value=v)
    assert roundtrip(msg).value == v


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64), st.integers(min_value=0, max_value=2**31 - 1))
def test_bytes_and_int32_roundtrip(b, code):
    msg = sm.StateResponse(statusCode=code, value=b)
    back = roundtrip(msg)
    assert back.statusCode == code and back.value == b


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=32), max_size=8), st.booleans())
def test_repeated_bytes_roundtrip(vals, fetch):
    msg = sm.StateResponseWithMapKeysOrValues(value=vals, requireNextFetch=fetch)
    back = roundtrip(msg)
    assert list(back.value) == vals and back.requireNextFetch == fetch


def test_truncated_input_raises():
    from google.protobuf._runtime import DecodeError

    good = sm.StateResponse(statusCode=1, errorMessage="boom").SerializeToString()
    with pytest.raises((DecodeError, Exception)):
        sm.StateResponse().ParseFromString(good[:-2])

"""Idempotent producer: InitProducerId (22) + sequence dedup in the
produce path — retries of an acknowledged batch append nothing and
re-acknowledge the ORIGINAL offset; sequence gaps are rejected."""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    ERR_OUT_OF_ORDER_SEQUENCE,
    decode_produce_response,
)
from kcore_spark.protocol.records import Record, encode_record_batch
from kcore_spark.protocol.server import KafkaFrontend

from tests.test_protocol_versions import _produce_payload


def _init_pid(fe, corr=81):
    w = wire.Writer()
    w.int16(wire.INIT_PRODUCER_ID_KEY).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.nullable_string(None)  # transactional_id
    w.int32(60000)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    pid = r.int64()
    epoch = r.int16()
    return pid, epoch


def test_init_producer_id_allocates_fresh_ids():
    fe = KafkaFrontend()
    p1, e1 = _init_pid(fe)
    p2, _ = _init_pid(fe, corr=82)
    assert p1 != p2 and e1 == 0


def _produce(fe, batch):
    resp = fe.handle_request(_produce_payload(3, "alpha", 0, batch))
    _, results, _ = decode_produce_response(resp, api_version=3)
    [(_, [row])] = results
    return row[1], row[2]  # err, base_offset


def test_duplicate_batch_is_deduplicated():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("alpha", 1)
    pid, epoch = _init_pid(fe)
    b0 = encode_record_batch(
        [Record(b"k", b"v0", 1), Record(b"k", b"v1", 2)],
        producer_id=pid, producer_epoch=epoch, base_sequence=0,
    )
    assert _produce(fe, b0) == (wire.ERR_NONE, 0)
    # network retry of the SAME batch: same offset back, nothing appended
    assert _produce(fe, b0) == (wire.ERR_NONE, 0)
    assert fe.wire_log.high_watermark("alpha", 0) == 2
    # next batch continues the sequence
    b1 = encode_record_batch(
        [Record(b"k", b"v2", 3)],
        producer_id=pid, producer_epoch=epoch, base_sequence=2,
    )
    assert _produce(fe, b1) == (wire.ERR_NONE, 2)
    # ...and ITS retry also dedups
    assert _produce(fe, b1) == (wire.ERR_NONE, 2)
    assert fe.wire_log.high_watermark("alpha", 0) == 3


def test_sequence_gap_rejected():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("alpha", 1)
    pid, epoch = _init_pid(fe)
    b0 = encode_record_batch(
        [Record(b"k", b"v0", 1)], producer_id=pid, producer_epoch=epoch, base_sequence=0
    )
    assert _produce(fe, b0) == (wire.ERR_NONE, 0)
    # skipping sequence 1 → OUT_OF_ORDER_SEQUENCE_NUMBER, no append
    b_gap = encode_record_batch(
        [Record(b"k", b"v9", 9)], producer_id=pid, producer_epoch=epoch, base_sequence=5
    )
    err, base = _produce(fe, b_gap)
    assert err == ERR_OUT_OF_ORDER_SEQUENCE and base == -1
    assert fe.wire_log.high_watermark("alpha", 0) == 1
    # a FIRST batch from a new pid must start at sequence 0
    pid2, _ = _init_pid(fe, corr=83)
    b_bad_start = encode_record_batch(
        [Record(b"k", b"x", 1)], producer_id=pid2, producer_epoch=0, base_sequence=3
    )
    err, _ = _produce(fe, b_bad_start)
    assert err == ERR_OUT_OF_ORDER_SEQUENCE


def test_non_idempotent_producers_unaffected():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("alpha", 1)
    b = encode_record_batch([Record(b"k", b"v", 1)])  # pid -1
    assert _produce(fe, b) == (wire.ERR_NONE, 0)
    assert _produce(fe, b) == (wire.ERR_NONE, 1)  # plain append semantics
    assert fe.wire_log.high_watermark("alpha", 0) == 2

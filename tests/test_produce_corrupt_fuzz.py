"""Corrupt-record-batch fuzz for the produce handler.

Fuzz-found (r11): ~12% of random batch mutations (truncations hitting
unpack_from → struct.error, garbage header keys → UnicodeDecodeError)
escaped handle_produce's except tuple. The connection-level dispatch
caught them, but the WHOLE produce request died instead of the one
corrupt partition getting CORRUPT_MESSAGE while the rest proceeds —
a real broker's contract. These tests pin the fixed behavior with a
seeded 600-mutation sweep plus an explicit mixed-request check.
No SparkSession needed.
"""

from __future__ import annotations

import random

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    WireLog,
    decode_produce_response,
    handle_produce,
)
from kcore_spark.protocol.records import Record, encode_record_batch


def _produce_payload(parts: list[tuple[int, bytes]], topic="t", version=3) -> bytes:
    w = wire.Writer()
    w.int16(wire.PRODUCE_KEY).int16(version).int32(7)
    w.nullable_string("cid")
    w.nullable_string(None)  # transactional_id
    w.int16(-1).int32(30000)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(len(parts))
    for p, batch in parts:
        w.int32(p)
        w.nullable_bytes(batch)
    return w.bytes()


def _good_batch() -> bytes:
    return encode_record_batch([Record(b"k", b"v", 1_700_000_000_000)])


def test_mutated_batches_get_corrupt_message_never_crash():
    rng = random.Random(0xBADC0DE)
    wl = WireLog()
    wl.create_topic("t", 1)
    good = _good_batch()
    saw_corrupt = saw_ok = 0
    for _ in range(600):
        b = bytearray(good)
        mode = rng.random()
        if mode < 0.4:
            b = b[: rng.randint(0, len(b))]
        elif mode < 0.8:
            for _ in range(rng.randint(1, 6)):
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
        else:
            b = bytearray(rng.randbytes(rng.randint(0, 80)))
        resp = handle_produce(wl, _produce_payload([(0, bytes(b))]))
        _corr, topics, _thr = decode_produce_response(bytes(resp))
        [(name, rows)] = topics
        assert name == "t" and len(rows) == 1
        err = rows[0][1]
        if err == wire.ERR_CORRUPT_MESSAGE:
            saw_corrupt += 1
        elif err == 0:
            saw_ok += 1  # mutation landed in slack the codec tolerates
        else:
            raise AssertionError(f"unexpected error code {err}")
    assert saw_corrupt > 0, "fuzz never produced a corrupt batch — broken fixture"


def test_corrupt_partition_does_not_poison_the_request():
    """Kafka semantics: the corrupt partition errors, siblings commit."""
    wl = WireLog()
    wl.create_topic("t", 2)
    good = _good_batch()
    truncated = good[:9]  # fails unpack_from mid-header (struct.error)
    resp = handle_produce(wl, _produce_payload([(0, truncated), (1, good)]))
    _corr, topics, _thr = decode_produce_response(bytes(resp))
    [(name, rows)] = topics
    by_part = {r[0]: r for r in rows}
    assert by_part[0][1] == wire.ERR_CORRUPT_MESSAGE
    assert by_part[1][1] == 0, "valid sibling partition must commit"
    assert by_part[1][2] == 0  # base offset of the accepted batch

"""Record-batch compression codecs (VERDICT r1 #4): gzip via stdlib,
snappy (xerial framing) / lz4 (LZ4 frame) / zstd (zstd frame) via the
codecs bundled in pyarrow — skipped cleanly when pyarrow is absent."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.protocol.records import (
    Record,
    compress_block,
    decode_record_batch,
    decompress_block,
    encode_record_batch,
)

ARROW_CODECS = ["snappy", "lz4", "zstd"]
ALL_CODECS = ["gzip", *ARROW_CODECS]


def _needs_pyarrow(name):
    if name in ARROW_CODECS:
        pytest.importorskip("pyarrow")


records_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.binary(max_size=64)),
        st.one_of(st.none(), st.binary(max_size=256)),
        st.integers(min_value=0, max_value=2**41),
    ),
    min_size=1,
    max_size=20,
)


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_batch_roundtrip_each_codec(codec):
    _needs_pyarrow(codec)
    recs = [
        Record(b"k1", b"v1" * 100, 1700000000000, headers=[("h", b"x")]),
        Record(None, b"v2", 1700000000123),
        Record(b"k3", None, 1700000001000),
    ]
    batch = encode_record_batch(recs, base_offset=7, compression=codec)
    base, got, end = decode_record_batch(batch)
    assert base == 7 and end == len(batch)
    assert [(r.key, r.value, r.timestamp_ms, r.offset) for r in got] == [
        (b"k1", b"v1" * 100, 1700000000000, 7),
        (None, b"v2", 1700000000123, 8),
        (b"k3", None, 1700000001000, 9),
    ]
    assert got[0].headers == [("h", b"x")]


@pytest.mark.parametrize("codec", ALL_CODECS)
@given(data=records_strategy)
@settings(max_examples=25, deadline=None)
def test_batch_roundtrip_property(codec, data):
    _needs_pyarrow(codec)
    recs = [Record(k, v, ts) for k, v, ts in data]
    batch = encode_record_batch(recs, base_offset=0, compression=codec)
    _, got, _ = decode_record_batch(batch)
    assert [(r.key, r.value, r.timestamp_ms) for r in got] == data


@pytest.mark.parametrize("codec", ALL_CODECS)
@given(blob=st.binary(min_size=0, max_size=4096))
@settings(max_examples=50, deadline=None)
def test_block_roundtrip_property(codec, blob):
    _needs_pyarrow(codec)
    assert decompress_block(codec, compress_block(codec, blob)) == blob


def test_snappy_xerial_framing():
    pytest.importorskip("pyarrow")
    comp = compress_block("snappy", b"payload" * 50)
    assert comp[:8] == b"\x82SNAPPY\x00"
    version, compat = struct.unpack_from(">ii", comp, 8)
    assert (version, compat) == (1, 1)
    (blen,) = struct.unpack_from(">i", comp, 16)
    assert 20 + blen == len(comp)


def test_snappy_accepts_raw_block():
    # librdkafka sends raw snappy blocks without xerial framing
    pa = pytest.importorskip("pyarrow")
    raw = pa.Codec("snappy").compress(b"raw block payload", asbytes=True)
    assert decompress_block("snappy", raw) == b"raw block payload"


def test_lz4_and_zstd_emit_standard_frames():
    pytest.importorskip("pyarrow")
    assert compress_block("lz4", b"x" * 100)[:4] == bytes.fromhex("04224d18")
    assert compress_block("zstd", b"x" * 100)[:4] == bytes.fromhex("28b52ffd")


def test_corrupt_compressed_payload_is_value_error():
    pytest.importorskip("pyarrow")
    batch = bytearray(encode_record_batch([Record(b"k", b"v", 1)], compression="zstd"))
    # flip a byte inside the compressed block (after the 61-byte header)
    batch[70] ^= 0xFF
    with pytest.raises(ValueError):
        decode_record_batch(bytes(batch))

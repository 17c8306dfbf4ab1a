"""Pure-Python Avro BINARY encoding for flat record schemas — the
payload half of the declared "Avro via from_avro" row (SURVEY §1.2).

This container ships the real Avro library JVM-side (avro-1.12.1, used
by the q_avro_source container-file roundtrip) but NOT the spark-avro
module's expression classes (AvroDataToCatalyst / CatalystDataToAvro),
so ``pyspark.sql.avro.functions.from_avro`` raises
AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE. This codec implements the Avro
1.x *binary encoding* (the spec's "Binary Encoding" section: zig-zag
varint ints/longs, little-endian IEEE754 float/double, length-prefixed
UTF-8 strings/bytes, 1-byte booleans, varint-indexed unions) for flat
records — exactly the shape a Kafka topic carrying Avro-encoded
messages has — and is pinned by spec-derived golden bytes in
tests/test_avro_codec.py (the same stance as the Kafka wire codecs:
spec bytes in lieu of the absent library).

Scale: encode/decode run row-wise INSIDE an Arrow-batched pandas UDF
(queries/sources_q.py::q_avro_payload_decode) — embarrassingly
parallel, no shuffle, the same execution shape as the media codecs.

Reference parity hook: the reference declares an event-streaming data
model with schema'd payloads (/root/reference/README.md:17); Avro is
the canonical wire schema for that model.
"""

from __future__ import annotations

import struct

# A field type is one of: "long", "int", "double", "float", "string",
# "bytes", "boolean", or "null_or_<T>" for the union ["null", <T>].
Schema = list[tuple[str, str]]


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_varint(u: int, out: bytearray) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def write_long(n: int, out: bytearray) -> None:
    write_varint(zigzag(int(n)), out)


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = read_varint(buf, pos)
    return unzigzag(u), pos


def _encode_value(v, ftype: str, out: bytearray) -> None:
    if ftype.startswith("null_or_"):
        if v is None:
            write_varint(zigzag(0), out)  # union branch 0 = null
            return
        write_varint(zigzag(1), out)  # union branch 1 = the value type
        ftype = ftype[len("null_or_") :]
    if ftype in ("long", "int"):
        write_long(v, out)
    elif ftype == "double":
        out += struct.pack("<d", float(v))
    elif ftype == "float":
        out += struct.pack("<f", float(v))
    elif ftype == "boolean":
        out.append(1 if v else 0)
    elif ftype == "string":
        b = str(v).encode("utf-8")
        write_long(len(b), out)
        out += b
    elif ftype == "bytes":
        write_long(len(v), out)
        out += bytes(v)
    else:  # pragma: no cover - schema authoring error
        raise ValueError(f"unsupported avro type: {ftype}")


def _decode_value(buf: bytes, pos: int, ftype: str):
    if ftype.startswith("null_or_"):
        branch, pos = read_long(buf, pos)
        if branch == 0:
            return None, pos
        ftype = ftype[len("null_or_") :]
    if ftype in ("long", "int"):
        return read_long(buf, pos)
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    if ftype == "string":
        n, pos = read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if ftype == "bytes":
        n, pos = read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type: {ftype}")  # pragma: no cover


def encode_record(values, schema: Schema) -> bytes:
    """Avro binary encoding of one record: fields back-to-back in
    schema order, no header/sync (the Kafka-payload shape; container
    files add framing around the same bytes)."""
    out = bytearray()
    for v, (_, ftype) in zip(values, schema):
        _encode_value(v, ftype, out)
    return bytes(out)


def decode_record(buf: bytes, schema: Schema) -> tuple:
    vals = []
    pos = 0
    for _, ftype in schema:
        v, pos = _decode_value(buf, pos, ftype)
        vals.append(v)
    if pos != len(buf):
        raise ValueError(f"trailing bytes: {len(buf) - pos}")
    return tuple(vals)

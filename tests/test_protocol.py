"""Protocol round-trip tests — port of the reference's test strategy
(MockConnection pattern, `pkg/kafka/kafka_api_test.go:150-282`, and the
real-socket server tests, `pkg/server/server_test.go:73-211`)."""

from __future__ import annotations

import asyncio
import struct

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend


def _api_versions_request(version: int, correlation_id: int = 7, client_id: str = "pytest") -> bytes:
    w = wire.Writer()
    w.int16(wire.API_VERSIONS_KEY).int16(version).int32(correlation_id)
    w.nullable_string(client_id)
    if version >= 3:
        w.empty_tagged_fields()  # header tagged fields
        w.compact_string("kcore-test").compact_string("1.0")
        w.empty_tagged_fields()  # body tagged fields
    return w.bytes()


# ------------------------------------------------------ codec round-trips


@pytest.mark.parametrize("version", [0, 1, 2, 3])
def test_api_versions_roundtrip(version):
    fe = KafkaFrontend()
    resp = fe.handle_request(_api_versions_request(version, correlation_id=42))
    corr, err, apis, throttle = wire.decode_api_versions_response(resp, version)
    assert corr == 42  # correlation echo (reference: kafka_api.go:100)
    assert err == wire.ERR_NONE
    assert (wire.API_VERSIONS_KEY, 0, 3) in apis
    assert throttle == 0


def test_unsupported_version_gets_error_not_disconnect():
    fe = KafkaFrontend()
    resp = fe.handle_request(_api_versions_request(99))
    corr, err, apis, _ = wire.decode_api_versions_response(resp, 0)
    assert err == wire.ERR_UNSUPPORTED_VERSION
    assert apis  # supported ranges still advertised (KIP-511)


def test_unknown_api_key_gets_error_response():
    w = wire.Writer()
    w.int16(999).int16(0).int32(13)
    w.nullable_string("c")
    resp = KafkaFrontend().handle_request(w.bytes())
    corr, err, _, _ = wire.decode_api_versions_response(resp, 0)
    assert corr == 13
    assert err == wire.ERR_UNSUPPORTED_VERSION


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 16383, 16384, 2**31 - 1]:
        w = wire.Writer().unsigned_varint(v)
        assert wire.Reader(w.bytes()).unsigned_varint() == v


# ------------------------------------------------------ real-socket tests


async def _request_response(host: str, port: int, frames: list[bytes]) -> list[bytes]:
    reader, writer = await asyncio.open_connection(host, port)
    out = []
    for f in frames:  # strictly ordered, one in flight (reference model)
        writer.write(struct.pack(">I", len(f)) + f)
        await writer.drain()
        (size,) = struct.unpack(">I", await reader.readexactly(4))
        out.append(await reader.readexactly(size))
    writer.close()
    return out


def test_server_socket_ordered_delivery():
    async def run():
        fe = KafkaFrontend(port=0)
        await fe.start()
        try:
            frames = [_api_versions_request(3, correlation_id=i) for i in range(5)]
            resps = await _request_response(fe.host, fe.port, frames)
            for i, r in enumerate(resps):
                corr, err, _, _ = wire.decode_api_versions_response(r, 3)
                assert corr == i  # responses in request order
                assert err == wire.ERR_NONE
        finally:
            await fe.stop()

    asyncio.run(run())


def test_server_concurrent_clients():
    async def run():
        fe = KafkaFrontend(port=0)
        await fe.start()
        try:

            async def client(cid: int):
                [r] = await _request_response(
                    fe.host, fe.port, [_api_versions_request(3, correlation_id=cid)]
                )
                corr, err, _, _ = wire.decode_api_versions_response(r, 3)
                assert (corr, err) == (cid, wire.ERR_NONE)

            await asyncio.gather(*[client(i) for i in range(8)])
        finally:
            await fe.stop()

    asyncio.run(run())


def test_server_stop_refuses_connections():
    async def run():
        fe = KafkaFrontend(port=0)
        await fe.start()
        host, port = fe.host, fe.port
        await fe.stop()
        with pytest.raises(OSError):
            await asyncio.open_connection(host, port)

    asyncio.run(run())


def test_metadata_lists_topics(spark, tmp_path):
    from kcore_spark.sources.topic_log import TopicLog

    log = TopicLog(spark, str(tmp_path))
    log.create_topic("alpha", 3)
    log.create_topic("beta", 1)
    fe = KafkaFrontend(topic_log=log)
    w = wire.Writer()
    w.int16(wire.METADATA_KEY).int16(1).int32(5)
    w.nullable_string("c")
    resp = fe.handle_request(w.bytes())
    r = wire.Reader(resp)
    assert r.int32() == 5  # correlation
    assert r.int32() == 1  # one broker
    r.int32()
    r.nullable_string()
    r.int32()
    r.nullable_string()  # rack
    r.int32()  # controller
    n_topics = r.int32()
    names = []
    for _ in range(n_topics):
        r.int16()
        names.append(r.nullable_string())
        r.read(1)
        n_parts = r.int32()
        for _ in range(n_parts):
            r.int16(), r.int32(), r.int32()
            for _ in range(r.int32()):
                r.int32()
            for _ in range(r.int32()):
                r.int32()
    assert names == ["alpha", "beta"]


# ------------------------------------------------ dispatch fuzz


def test_truncated_and_garbage_payloads_never_crash_dispatch():
    """Every advertised (api_key, version) must survive truncated and
    garbage bodies — a malformed request may get an error response or
    None (connection close), never an exception out of dispatch."""
    import struct

    from kcore_spark.protocol.server import KafkaFrontend

    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    for key, lo, hi in wire.SUPPORTED_APIS:
        for version in (lo, hi):
            base = struct.pack(">hhi", key, version, 1) + b"\x00\x03fuz"
            for payload in (
                base,                      # header only
                base + b"\x00",            # 1 stray byte
                base + b"\xff" * 8,        # null-ish array counts
                base + b"\x7f\xff\xff\xff" * 4,  # huge counts
                base[:6],                  # truncated header
            ):
                try:
                    fe.handle_request(payload)
                except Exception as e:  # noqa: BLE001 - the assertion
                    raise AssertionError(
                        f"api {key} v{version} crashed on {payload!r}: {e!r}"
                    ) from e


def test_random_bodies_never_crash_dispatch():
    """Seeded random-byte bodies at every advertised (api_key, top
    version): beyond the hand-crafted shapes above, arbitrary garbage —
    random lengths, random content, random truncation of an otherwise
    plausible header — must yield an error response or None, never an
    exception. Deterministic (fixed seed) so any failure reproduces."""
    import random
    import struct

    from kcore_spark.protocol.server import KafkaFrontend

    rng = random.Random(0xC0FFEE)
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    for key, lo, hi in wire.SUPPORTED_APIS:
        header = struct.pack(">hhi", key, hi, 1) + b"\x00\x03fuz"
        for _ in range(40):
            body = rng.randbytes(rng.randint(0, 96))
            payload = header + body
            if rng.random() < 0.25:  # random truncation incl. mid-header
                payload = payload[: rng.randint(0, len(payload))]
            try:
                fe.handle_request(payload)
            except Exception as e:  # noqa: BLE001 - the assertion
                raise AssertionError(
                    f"api {key} v{hi} crashed on random body {payload!r}: {e!r}"
                ) from e

"""Connection cap: the N+1th connection queues (no response) until a
slot frees, then is served — back-pressure, not unbounded state or a
reset. The reference leaves this as a TODO
(`/root/reference/pkg/server/server.go:77`)."""

from __future__ import annotations

import asyncio
import struct

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend


def _api_versions_frame(corr=1) -> bytes:
    w = wire.Writer()
    w.int16(wire.API_VERSIONS_KEY).int16(0).int32(corr)
    w.nullable_string("cap-test")
    return w.bytes()


async def _rpc(reader, writer, frame: bytes) -> bytes:
    writer.write(struct.pack(">I", len(frame)) + frame)
    await writer.drain()
    (size,) = struct.unpack(">I", await reader.readexactly(4))
    return await reader.readexactly(size)


def test_over_cap_connection_queues_until_slot_frees():
    async def run():
        fe = KafkaFrontend(port=0, max_connections=2)
        await fe.start()
        try:
            c1 = await asyncio.open_connection(fe.host, fe.port)
            c2 = await asyncio.open_connection(fe.host, fe.port)
            # both in-cap connections are served
            assert await _rpc(*c1, _api_versions_frame(1))
            assert await _rpc(*c2, _api_versions_frame(2))

            # the 3rd connection is accepted but NOT served: its request
            # loop is parked on the semaphore
            c3 = await asyncio.open_connection(fe.host, fe.port)
            c3[1].write(
                struct.pack(">I", len(_api_versions_frame(3))) + _api_versions_frame(3)
            )
            await c3[1].drain()
            with __import__("pytest").raises(asyncio.TimeoutError):
                await asyncio.wait_for(c3[0].readexactly(4), timeout=0.3)

            # free a slot → the queued connection is served the request
            # it already sent
            c1[1].close()
            await c1[1].wait_closed()
            (size,) = struct.unpack(
                ">I", await asyncio.wait_for(c3[0].readexactly(4), timeout=2.0)
            )
            resp = await c3[0].readexactly(size)
            assert struct.unpack(">i", resp[:4])[0] == 3  # correlation id
            c2[1].close()
            c3[1].close()
        finally:
            await fe.stop()

    asyncio.run(run())

"""SASL/PLAIN authentication: SaslHandshake (17) + SaslAuthenticate (36).

Covers both public flows — KIP-152 wrapped (handshake v1 →
SaslAuthenticate) and legacy raw-token (handshake v0 → bare frame) —
plus enforcement: with credentials configured, a connection gets no
API beyond ApiVersions/SASL until it authenticates, and auth failures
close the connection after delivering the error (real broker
behavior). The reference declares Encryption & Auth as an unchecked
roadmap row (`/root/reference/README.md:51`); this is the auth half.
"""

from __future__ import annotations

import asyncio
import struct

import pytest

from kcore_spark.protocol import auth, wire
from kcore_spark.protocol.server import KafkaFrontend

CREDS = {"alice": "wonderland", "bob": "builder"}


def _handshake_req(version: int, mechanism: str, corr: int = 1) -> bytes:
    w = wire.Writer()
    w.int16(auth.SASL_HANDSHAKE_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.nullable_string(mechanism)
    return w.bytes()


def _auth_req(token: bytes, version: int = 1, corr: int = 2) -> bytes:
    w = wire.Writer()
    w.int16(auth.SASL_AUTHENTICATE_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.int32(len(token)).raw(token)
    return w.bytes()


def _plain_token(user: str, password: str, authzid: str = "") -> bytes:
    return b"\x00".join([authzid.encode(), user.encode(), password.encode()])


def _metadata_req(corr: int = 3) -> bytes:
    w = wire.Writer()
    w.int16(wire.METADATA_KEY).int16(1).int32(corr)
    w.nullable_string("pytest")
    w.int32(-1)  # all topics
    return w.bytes()


def _parse_handshake_resp(resp: bytes) -> tuple[int, int, list[str]]:
    r = wire.Reader(resp)
    corr, err = r.int32(), r.int16()
    mechs = [r.nullable_string() for _ in range(r.int32())]
    return corr, err, mechs


def _parse_auth_resp(resp: bytes, version: int = 1):
    r = wire.Reader(resp)
    corr, err = r.int32(), r.int16()
    msg = r.nullable_string()
    tok = r.nullable_bytes()
    lifetime = r.int64() if version >= 1 else None
    return corr, err, msg, tok, lifetime


# ------------------------------------------------------ unit-level


def test_handshake_negotiates_plain():
    st = auth.SaslState()
    corr, err, mechs = _parse_handshake_resp(
        auth.handle_sasl_handshake(st, _handshake_req(1, "PLAIN", corr=9))
    )
    assert (corr, err, mechs) == (9, wire.ERR_NONE, ["PLAIN"])
    assert st.mechanism == "PLAIN" and not st.expect_raw_token


def test_handshake_unknown_mechanism_lists_supported():
    st = auth.SaslState()
    corr, err, mechs = _parse_handshake_resp(
        auth.handle_sasl_handshake(st, _handshake_req(1, "SCRAM-SHA-256"))
    )
    assert err == auth.ERR_UNSUPPORTED_SASL_MECHANISM
    assert mechs == ["PLAIN"]  # listed so the client's NEXT connection can use one
    assert st.mechanism is None
    # the error is delivered and then the connection closes (real-broker
    # behavior) — no unlimited pre-auth retries on one connection
    assert st.failed


def test_authenticate_success_and_wrong_password():
    st = auth.SaslState()
    auth.handle_sasl_handshake(st, _handshake_req(1, "PLAIN"))
    corr, err, msg, tok, lifetime = _parse_auth_resp(
        auth.handle_sasl_authenticate(st, CREDS, _auth_req(_plain_token("alice", "wonderland")))
    )
    assert err == wire.ERR_NONE and st.authenticated and st.authorization_id == "alice"
    assert tok == b"" and lifetime == auth.SESSION_LIFETIME_MS

    st2 = auth.SaslState()
    auth.handle_sasl_handshake(st2, _handshake_req(1, "PLAIN"))
    _, err2, msg2, _, _ = _parse_auth_resp(
        auth.handle_sasl_authenticate(st2, CREDS, _auth_req(_plain_token("alice", "nope")))
    )
    assert err2 == auth.ERR_SASL_AUTHENTICATION_FAILED
    assert st2.failed and not st2.authenticated


def test_authenticate_without_handshake_is_illegal_state():
    st = auth.SaslState()
    _, err, msg, _, _ = _parse_auth_resp(
        auth.handle_sasl_authenticate(st, CREDS, _auth_req(_plain_token("alice", "wonderland")))
    )
    assert err == auth.ERR_ILLEGAL_SASL_STATE
    assert not st.authenticated


def test_plain_token_shapes():
    assert auth.parse_plain_token(b"\x00u\x00p") == ("", "u", "p")
    assert auth.parse_plain_token(b"z\x00u\x00p") == ("z", "u", "p")
    with pytest.raises(ValueError):
        auth.parse_plain_token(b"no-separators")
    with pytest.raises(ValueError):
        auth.parse_plain_token(b"\x00\x00p")  # empty authcid
    with pytest.raises(ValueError):
        auth.parse_plain_token(b"a\x00b\x00c\x00d")


def test_authzid_defaults_to_authcid_and_is_kept_when_given():
    st = auth.SaslState()
    auth.handle_sasl_handshake(st, _handshake_req(1, "PLAIN"))
    auth.handle_sasl_authenticate(st, CREDS, _auth_req(_plain_token("bob", "builder", authzid="ops")))
    assert st.authorization_id == "ops"


# ------------------------------------------------------ enforcement


def test_unauthenticated_data_api_closed_when_credentials_set():
    fe = KafkaFrontend(credentials=CREDS)
    st = auth.SaslState()
    assert fe.handle_request(_metadata_req(), sasl=st) is None  # closed
    # ApiVersions stays reachable pre-auth (clients probe it first)
    w = wire.Writer()
    w.int16(wire.API_VERSIONS_KEY).int16(0).int32(5)
    w.nullable_string("pytest")
    assert fe.handle_request(w.bytes(), sasl=st) is not None


def test_no_credentials_means_no_enforcement():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    assert fe.handle_request(_metadata_req()) is not None


# ------------------------------------------------------ e2e over TCP


async def _talk(host: str, port: int, frames: list[bytes]) -> list[bytes]:
    reader, writer = await asyncio.open_connection(host, port)
    out = []
    for f in frames:
        writer.write(struct.pack(">I", len(f)) + f)
        await writer.drain()
        (size,) = struct.unpack(">I", await reader.readexactly(4))
        out.append(await reader.readexactly(size))
    writer.close()
    return out


def test_e2e_kip152_flow_then_metadata():
    async def run():
        fe = KafkaFrontend(port=0, credentials=CREDS)
        fe.wire_log.create_topic("secure", 2)
        await fe.start()
        try:
            resps = await _talk(
                fe.host,
                fe.port,
                [
                    _handshake_req(1, "PLAIN"),
                    _auth_req(_plain_token("alice", "wonderland")),
                    _metadata_req(corr=30),
                ],
            )
            _, err, _ = _parse_handshake_resp(resps[0])
            assert err == wire.ERR_NONE
            _, err2, _, _, _ = _parse_auth_resp(resps[1])
            assert err2 == wire.ERR_NONE
            corr, _, topics = wire.decode_metadata_response(resps[2], 1)
            assert corr == 30 and [t[1] for t in topics] == ["secure"]
        finally:
            await fe.stop()

    asyncio.run(run())


def test_e2e_legacy_v0_raw_token_flow():
    async def run():
        fe = KafkaFrontend(port=0, credentials=CREDS)
        fe.wire_log.create_topic("secure", 1)
        await fe.start()
        try:
            resps = await _talk(
                fe.host,
                fe.port,
                [
                    _handshake_req(0, "PLAIN"),
                    _plain_token("bob", "builder"),  # RAW frame, no header
                    _metadata_req(corr=31),
                ],
            )
            _, err, _ = _parse_handshake_resp(resps[0])
            assert err == wire.ERR_NONE
            assert resps[1] == b""  # empty server token
            corr, _, topics = wire.decode_metadata_response(resps[2], 1)
            assert corr == 31 and len(topics) == 1
        finally:
            await fe.stop()

    asyncio.run(run())


def test_e2e_bad_password_closes_connection():
    async def run():
        fe = KafkaFrontend(port=0, credentials=CREDS)
        await fe.start()
        try:
            reader, writer = await asyncio.open_connection(fe.host, fe.port)
            for f in [_handshake_req(1, "PLAIN"), _auth_req(_plain_token("alice", "wrong"))]:
                writer.write(struct.pack(">I", len(f)) + f)
                await writer.drain()
                (size,) = struct.unpack(">I", await reader.readexactly(4))
                resp = await reader.readexactly(size)
            _, err, msg, _, _ = _parse_auth_resp(resp)
            assert err == auth.ERR_SASL_AUTHENTICATION_FAILED
            # the error is delivered, THEN the server closes
            assert await reader.read(4) == b""
            writer.close()
        finally:
            await fe.stop()

    asyncio.run(run())


def test_e2e_unauthenticated_metadata_closed():
    async def run():
        fe = KafkaFrontend(port=0, credentials=CREDS)
        await fe.start()
        try:
            reader, writer = await asyncio.open_connection(fe.host, fe.port)
            f = _metadata_req()
            writer.write(struct.pack(">I", len(f)) + f)
            await writer.drain()
            assert await reader.read(4) == b""  # closed, no response
            writer.close()
        finally:
            await fe.stop()

    asyncio.run(run())

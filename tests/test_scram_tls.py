"""SCRAM-SHA-256/512 and TLS: the encryption+challenge-response half
of the reference's declared "Encryption & Authentication" roadmap row
(`/root/reference/README.md:51`).

Covers the RFC 5802 math client-vs-server (independent
implementations in protocol/scram.py), the Kafka wire flow
(SaslHandshake v1 → two SaslAuthenticate round-trips with the server
challenge in auth_bytes), the k50/k51 credential admin APIs, TLS
termination on the asyncio listener, and the SASL_SSL combination —
SCRAM over TLS — that real clusters deploy."""

from __future__ import annotations

import asyncio
import base64
import ssl
import struct
import subprocess
import tempfile

import pytest

from kcore_spark.protocol import auth, wire
from kcore_spark.protocol.scram import (
    MECH_CODES,
    ScramClient,
    ScramExchange,
    make_credential,
)
from kcore_spark.protocol.server import KafkaFrontend

from .test_auth import (
    _auth_req,
    _handshake_req,
    _metadata_req,
    _parse_auth_resp,
    _parse_handshake_resp,
)

SCRAM_CREDS = {
    ("alice", "SCRAM-SHA-256"): make_credential("wonderland", "SCRAM-SHA-256"),
    ("alice", "SCRAM-SHA-512"): make_credential("wonderland", "SCRAM-SHA-512"),
}


# ------------------------------------------------------ RFC math


@pytest.mark.parametrize("mech", ["SCRAM-SHA-256", "SCRAM-SHA-512"])
def test_scram_exchange_roundtrip(mech):
    ex = ScramExchange(mech, SCRAM_CREDS)
    cl = ScramClient("alice", "wonderland", mech)
    server_first = ex.server_first(cl.first())
    assert server_first is not None
    server_final = ex.server_final(cl.final(server_first))
    assert server_final is not None, ex.error
    assert ex.username == "alice" and ex.stage == 2
    # mutual auth: client verifies the server knew ServerKey
    assert cl.verify_server(server_final)


def test_scram_wrong_password_fails_proof():
    ex = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
    cl = ScramClient("alice", "not-wonderland")
    out = ex.server_final(cl.final(ex.server_first(cl.first())))
    assert out is None and ex.error == "invalid credentials"


def test_scram_unknown_user_fails_uniformly():
    ex = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
    cl = ScramClient("mallory", "whatever")
    server_first = ex.server_first(cl.first())
    assert server_first is not None  # same shape as a real user
    assert ex.server_final(cl.final(server_first)) is None


def test_scram_nonce_tamper_rejected():
    ex = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
    cl = ScramClient("alice", "wonderland")
    final = cl.final(ex.server_first(cl.first())).decode()
    attrs = dict(p.split("=", 1) for p in final.split(",") if "=" in p)
    forged = f"c={attrs['c']},r={attrs['r']}X,p={attrs['p']}".encode()
    assert ex.server_final(forged) is None and ex.error == "nonce mismatch"


# ------------------------------------------------------ wire flow


async def _talk(host, port, frames, ssl_ctx=None):
    reader, writer = await asyncio.open_connection(host, port, ssl=ssl_ctx)
    out = []
    try:
        for f in frames:
            writer.write(struct.pack(">I", len(f)) + f)
            await writer.drain()
            (size,) = struct.unpack(">I", await reader.readexactly(4))
            out.append(await reader.readexactly(size))
    finally:
        writer.close()
    return out


def _scram_frames(cl: ScramClient):
    """Handshake + client-first; the caller sends client-final after
    reading the server challenge."""
    return [
        _handshake_req(1, cl.mechanism),
        _auth_req(cl.first(), corr=2),
    ]


async def _scram_login_then_metadata(host, port, user, password, ssl_ctx=None):
    cl = ScramClient(user, password)
    reader, writer = await asyncio.open_connection(host, port, ssl=ssl_ctx)
    try:

        async def rt(frame):
            writer.write(struct.pack(">I", len(frame)) + frame)
            await writer.drain()
            (size,) = struct.unpack(">I", await reader.readexactly(4))
            return await reader.readexactly(size)

        corr, err, mechs = _parse_handshake_resp(await rt(_handshake_req(1, cl.mechanism)))
        assert err == wire.ERR_NONE and cl.mechanism in mechs
        _, err, msg, challenge, _ = _parse_auth_resp(await rt(_auth_req(cl.first(), corr=2)))
        assert err == wire.ERR_NONE, msg
        _, err, msg, server_final, _ = _parse_auth_resp(
            await rt(_auth_req(cl.final(challenge), corr=3))
        )
        if err != wire.ERR_NONE:
            return err, None
        assert cl.verify_server(server_final)
        meta = await rt(_metadata_req(corr=4))
        return err, meta
    finally:
        writer.close()


def test_e2e_scram_flow_then_metadata():
    async def run():
        fe = KafkaFrontend(port=0, scram_credentials=dict(SCRAM_CREDS))
        fe.wire_log.create_topic("alpha", 1)
        await fe.start()
        try:
            err, meta = await _scram_login_then_metadata(fe.host, fe.port, "alice", "wonderland")
            assert err == wire.ERR_NONE and meta is not None
            r = wire.Reader(meta)
            assert r.int32() == 4  # metadata correlation id
        finally:
            await fe.stop()

    asyncio.run(run())


def test_e2e_scram_bad_password_connection_closed():
    async def run():
        fe = KafkaFrontend(port=0, scram_credentials=dict(SCRAM_CREDS))
        await fe.start()
        try:
            err, _ = await _scram_login_then_metadata(fe.host, fe.port, "alice", "wrong")
            assert err == auth.ERR_SASL_AUTHENTICATION_FAILED
        finally:
            await fe.stop()

    asyncio.run(run())


def test_e2e_unauthenticated_blocked_when_scram_only():
    """SCRAM store alone (no PLAIN creds) must still gate data APIs."""

    async def run():
        fe = KafkaFrontend(port=0, scram_credentials=dict(SCRAM_CREDS))
        await fe.start()
        try:
            with pytest.raises(asyncio.IncompleteReadError):
                await _talk(fe.host, fe.port, [_metadata_req()])
        finally:
            await fe.stop()

    asyncio.run(run())


def test_handshake_v0_scram_is_illegal():
    state = auth.SaslState()
    resp = auth.handle_sasl_handshake(
        state,
        _handshake_req(0, "SCRAM-SHA-256"),
        mechanisms=auth.MECHANISMS + auth.SCRAM_MECHANISMS,
    )
    _, err, _ = _parse_handshake_resp(resp)
    assert err == auth.ERR_ILLEGAL_SASL_STATE and state.failed


# ------------------------------------------------------ k50/k51 admin


def _alter_req(upserts, deletes=(), corr=7):
    w = wire.Writer()
    w.int16(51).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    w.compact_array_len(len(deletes))
    for user, mech in deletes:
        w.compact_string(user)
        w.int8(MECH_CODES[mech])
        w.empty_tagged_fields()
    w.compact_array_len(len(upserts))
    for user, mech, iters, salt, salted_pw in upserts:
        w.compact_string(user)
        w.int8(MECH_CODES[mech])
        w.int32(iters)
        w.compact_bytes(salt)
        w.compact_bytes(salted_pw)
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _describe_req(users=None, corr=8):
    w = wire.Writer()
    w.int16(50).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    if users is None:
        w.compact_array_len(-1)
    else:
        w.compact_array_len(len(users))
        for u in users:
            w.compact_string(u)
            w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _admin_session():
    st = auth.SaslState()
    st.authenticated = True
    st.authorization_id = "admin"
    return st


def test_alter_then_authenticate_with_provisioned_credential():
    import hashlib

    fe = KafkaFrontend(scram_credentials={})
    salt, iters = b"pepper-salt-0123", 4096
    salted = hashlib.pbkdf2_hmac("sha256", b"s3cret", salt, iters)
    resp = fe.handle_request(
        _alter_req([("carol", "SCRAM-SHA-256", iters, salt, salted)]),
        sasl=_admin_session(),
    )
    r = wire.Reader(resp)
    assert r.int32() == 7
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "carol"
    assert r.int16() == wire.ERR_NONE
    # the provisioned verifier authenticates a real exchange
    ex = ScramExchange("SCRAM-SHA-256", fe.scram_credentials)
    cl = ScramClient("carol", "s3cret")
    assert ex.server_final(cl.final(ex.server_first(cl.first()))) is not None

    # describe lists mechanism + iterations, never key material
    resp = fe.handle_request(_describe_req(["carol"]), sasl=_admin_session())
    r = wire.Reader(resp)
    assert r.int32() == 8
    r.tagged_fields()
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None
    assert r.compact_array_len() == 1
    assert r.compact_string() == "carol"
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None
    assert r.compact_array_len() == 1
    assert r.int8() == 1 and r.int32() == iters

    # delete → exchange now fails
    resp = fe.handle_request(
        _alter_req([], deletes=[("carol", "SCRAM-SHA-256")], corr=9),
        sasl=_admin_session(),
    )
    ex2 = ScramExchange("SCRAM-SHA-256", fe.scram_credentials)
    cl2 = ScramClient("carol", "s3cret")
    assert ex2.server_final(cl2.final(ex2.server_first(cl2.first()))) is None


def test_alter_rejects_weak_iterations():
    fe = KafkaFrontend(scram_credentials={})
    resp = fe.handle_request(
        _alter_req([("dave", "SCRAM-SHA-256", 100, b"salt", b"x" * 32)]),
        sasl=_admin_session(),
    )
    r = wire.Reader(resp)
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.compact_array_len() == 1
    assert r.compact_string() == "dave"
    assert r.int16() == 93  # UNACCEPTABLE_CREDENTIAL
    assert ("dave", "SCRAM-SHA-256") not in fe.scram_credentials


# ------------------------------------------------------ TLS


@pytest.fixture(scope="module")
def tls_pair():
    d = tempfile.mkdtemp(prefix="kcore_tls_")
    key, crt = f"{d}/key.pem", f"{d}/cert.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key, "-out", crt, "-days", "1",
            "-subj", "/CN=127.0.0.1",
            "-addext", "subjectAltName=IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    return key, crt


def _client_ctx(crt):
    ctx = ssl.create_default_context(cafile=crt)
    ctx.check_hostname = False  # IP SAN; CA pinning still verifies
    return ctx


def test_tls_api_versions_roundtrip(tls_pair):
    key, crt = tls_pair

    async def run():
        server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        server_ctx.load_cert_chain(crt, key)
        fe = KafkaFrontend(port=0, ssl_context=server_ctx)
        await fe.start()
        try:
            w = wire.Writer()
            w.int16(wire.API_VERSIONS_KEY).int16(0).int32(11)
            w.nullable_string("tls-client")
            resps = await _talk(fe.host, fe.port, [w.bytes()], ssl_ctx=_client_ctx(crt))
            corr, err, apis, _ = wire.decode_api_versions_response(resps[0], 0)
            assert corr == 11 and err == 0 and len(apis) >= 10
        finally:
            await fe.stop()

    asyncio.run(run())


def test_plaintext_client_cannot_talk_to_tls_listener(tls_pair):
    key, crt = tls_pair

    async def run():
        server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        server_ctx.load_cert_chain(crt, key)
        fe = KafkaFrontend(port=0, ssl_context=server_ctx)
        await fe.start()
        try:
            with pytest.raises((asyncio.IncompleteReadError, ConnectionResetError, asyncio.TimeoutError)):
                await asyncio.wait_for(
                    _talk(fe.host, fe.port, [_metadata_req()]), timeout=5
                )
        finally:
            await fe.stop()

    asyncio.run(run())


def test_sasl_ssl_scram_over_tls(tls_pair):
    """The production posture: TLS-wrapped listener + SCRAM auth; the
    whole challenge-response runs inside the encrypted channel and the
    authenticated principal drives Metadata like any session."""
    key, crt = tls_pair

    async def run():
        server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        server_ctx.load_cert_chain(crt, key)
        fe = KafkaFrontend(
            port=0, scram_credentials=dict(SCRAM_CREDS), ssl_context=server_ctx
        )
        fe.wire_log.create_topic("alpha", 1)
        await fe.start()
        try:
            err, meta = await _scram_login_then_metadata(
                fe.host, fe.port, "alice", "wonderland", ssl_ctx=_client_ctx(crt)
            )
            assert err == wire.ERR_NONE and meta is not None
        finally:
            await fe.stop()

    asyncio.run(run())


# ------------------------------------------------------ KIP-368 re-auth


def test_reauth_extends_session_and_expiry_closes():
    """KIP-368 over the wire: a broker advertising a session lifetime
    accepts a second SASL flow on the SAME connection (refreshing the
    deadline), and a connection that lets its session lapse is closed
    on its next data request."""
    import time as _time

    async def run():
        fe = KafkaFrontend(
            port=0, scram_credentials=dict(SCRAM_CREDS), session_lifetime_ms=600
        )
        fe.wire_log.create_topic("alpha", 1)
        await fe.start()
        try:
            cl1 = ScramClient("alice", "wonderland")
            reader, writer = await asyncio.open_connection(fe.host, fe.port)
            try:

                async def rt(frame):
                    writer.write(struct.pack(">I", len(frame)) + frame)
                    await writer.drain()
                    (size,) = struct.unpack(">I", await reader.readexactly(4))
                    return await reader.readexactly(size)

                _parse_handshake_resp(await rt(_handshake_req(1, cl1.mechanism)))
                _, err, _, ch, _ = _parse_auth_resp(await rt(_auth_req(cl1.first(), corr=2)))
                _, err, _, _, lifetime = _parse_auth_resp(
                    await rt(_auth_req(cl1.final(ch), corr=3))
                )
                assert err == wire.ERR_NONE and lifetime == 600
                # metadata works while fresh
                r = wire.Reader(await rt(_metadata_req(corr=4)))
                assert r.int32() == 4
                # re-auth on the SAME connection before expiry
                _time.sleep(0.35)
                cl2 = ScramClient("alice", "wonderland")
                _, herr, _ = _parse_handshake_resp(await rt(_handshake_req(1, cl2.mechanism)))
                assert herr == wire.ERR_NONE  # re-auth permitted
                _, err, _, ch, _ = _parse_auth_resp(await rt(_auth_req(cl2.first(), corr=5)))
                _, err, _, _, _ = _parse_auth_resp(await rt(_auth_req(cl2.final(ch), corr=6)))
                assert err == wire.ERR_NONE
                # past the ORIGINAL deadline but inside the refreshed one
                _time.sleep(0.35)
                r = wire.Reader(await rt(_metadata_req(corr=7)))
                assert r.int32() == 7  # still authenticated
                # now let the refreshed session lapse → closed
                _time.sleep(0.75)
                with pytest.raises(asyncio.IncompleteReadError):
                    await rt(_metadata_req(corr=8))
            finally:
                writer.close()
        finally:
            await fe.stop()

    asyncio.run(run())


def test_reauth_refused_when_lifetime_zero():
    """lifetime=0 keeps the historical contract: a second handshake on
    an authenticated connection is ILLEGAL_SASL_STATE and closes."""
    state = auth.SaslState()
    state.authenticated = True
    resp = auth.handle_sasl_handshake(
        state, _handshake_req(1, "PLAIN"), allow_reauth=False
    )
    _, err, _ = _parse_handshake_resp(resp)
    assert err == auth.ERR_ILLEGAL_SASL_STATE and state.failed


# ------------------------------------------------------ adversarial fuzz


def test_scram_exchange_never_crashes_or_authenticates_on_garbage():
    """Property: arbitrary bytes at either stage of the exchange must
    yield a clean failure (None + error), never an exception and never
    stage 2 — the pre-auth surface is attacker-controlled input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz_first(data):
        ex = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
        out = ex.server_first(data)
        assert ex.stage in (0, 1)
        if out is None:
            assert ex.error

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz_final(data):
        ex = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
        cl = ScramClient("alice", "wonderland")
        ex.server_first(cl.first())
        out = ex.server_final(data)
        # garbage can never complete the proof
        assert out is None and ex.stage != 2 and ex.error

    fuzz_first()
    fuzz_final()


def test_scram_proof_bitflip_never_authenticates():
    """Flipping any single bit of a VALID proof must fail verification
    (the forged ClientKey hashes to a different StoredKey)."""
    ex0 = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
    cl = ScramClient("alice", "wonderland")
    sf = ex0.server_first(cl.first())
    final = cl.final(sf).decode()
    head, proof_b64 = final.rsplit(",p=", 1)
    proof = bytearray(base64.b64decode(proof_b64))
    for byte_idx in (0, len(proof) // 2, len(proof) - 1):
        for bit in (0, 7):
            forged = bytearray(proof)
            forged[byte_idx] ^= 1 << bit
            ex = ScramExchange("SCRAM-SHA-256", SCRAM_CREDS)
            cl2 = ScramClient("alice", "wonderland")
            sf2 = ex.server_first(cl2.first())
            good_final = cl2.final(sf2).decode()
            h2, p2 = good_final.rsplit(",p=", 1)
            pb = bytearray(base64.b64decode(p2))
            pb[byte_idx] ^= 1 << bit
            bad = f"{h2},p={base64.b64encode(bytes(pb)).decode()}".encode()
            assert ex.server_final(bad) is None


def test_gs2_y_header_client_authenticates():
    """RFC 5802 §6: a client that sends gs2 'y,,' (doesn't know whether
    the server supports channel binding) must echo c=base64('y,,') =
    'eSws' in client-final. Since this server never advertises -PLUS,
    that flow must AUTHENTICATE, not die on a 'biws'-only c= check
    (ADVICE r8)."""
    import base64

    from kcore_spark.protocol.scram import (
        ScramClient,
        ScramExchange,
        make_credential,
    )

    import hashlib
    import hmac

    from kcore_spark.protocol.scram import _parse_attrs

    creds = {("yuki", "SCRAM-SHA-256"): make_credential("pw", "SCRAM-SHA-256", b"s" * 16, 4096)}
    ex = ScramExchange("SCRAM-SHA-256", creds)
    cl = ScramClient("yuki", "pw")
    # the 'y' gs2 flow: 'y,,' header in round 1, and the PROOF is
    # computed over an auth message whose c= echoes that header
    first = b"y,," + cl.first().split(b",,", 1)[1]
    server_first = ex.server_first(first)
    assert server_first is not None
    sf = server_first.decode()
    attrs = _parse_attrs(sf)
    nonce, salt, iters = attrs["r"], base64.b64decode(attrs["s"]), int(attrs["i"])
    salted = hashlib.pbkdf2_hmac("sha256", b"pw", salt, iters)
    client_key = hmac.new(salted, b"Client Key", "sha256").digest()
    stored_key = hashlib.new("sha256", client_key).digest()
    without_proof = f"c={base64.b64encode(b'y,,').decode()},r={nonce}"
    auth_message = f"{cl._bare},{sf},{without_proof}".encode()
    client_sig = hmac.new(stored_key, auth_message, "sha256").digest()
    proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
    final = f"{without_proof},p={base64.b64encode(proof).decode()}".encode()
    assert ex.server_final(final) is not None, ex.error
    assert ex.stage == 2


def test_gs2_y_wrong_echo_still_rejected():
    """A 'y,,' client-first with a 'biws' (n,,) echo is a gs2 mismatch
    and must fail — the echo must match the actual header."""
    from kcore_spark.protocol.scram import ScramClient, ScramExchange, make_credential

    creds = {("yuki", "SCRAM-SHA-256"): make_credential("pw", "SCRAM-SHA-256", b"s" * 16, 4096)}
    ex = ScramExchange("SCRAM-SHA-256", creds)
    cl = ScramClient("yuki", "pw")
    first = b"y,," + cl.first().split(b",,", 1)[1]
    final = cl.final(ex.server_first(first))  # keeps c=biws
    assert ex.server_final(final) is None
    assert ex.error == "channel-binding mismatch"

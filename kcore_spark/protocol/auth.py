"""SASL wire APIs: SaslHandshake (17, v0-v1) + SaslAuthenticate (36, v0-v1).

Implements SASL/PLAIN (RFC 4616) over the Kafka SASL flow: the client
negotiates a mechanism with SaslHandshake, then presents the
``authzid NUL user NUL password`` token — wrapped in a SaslAuthenticate
request for handshake v1 (KIP-152), or as a RAW frame (no Kafka header)
for the legacy handshake-v0 flow. Both flows are supported; the
connection loop switches on ``SaslState.expect_raw_token``.

Semantics notes (matching the public protocol spec):
- SaslHandshake responses are NEVER flexible (even at the highest
  version) and list the mechanisms the broker supports, also on error,
  so a client can retry with one of them.
- An unknown mechanism → UNSUPPORTED_SASL_MECHANISM (33).
- Authenticate before handshake → ILLEGAL_SASL_STATE (34).
- Bad credentials → SASL_AUTHENTICATION_FAILED (58); real brokers also
  close the connection after delivering the error, which the
  connection loop does on ``state.failed``.

Provenance: the reference declares "Encryption & Auth" as an unchecked
roadmap row (`/root/reference/README.md:51`) with no implementation;
this module realizes SASL/PLAIN and the SASL framing; the
challenge-response mechanisms (SCRAM-SHA-256/512) and TLS live in
protocol/scram.py and the server's ssl_context (r7), completing the
roadmap row.
"""

from __future__ import annotations

import hmac
from dataclasses import dataclass

from kcore_spark.protocol import wire

SASL_HANDSHAKE_KEY = 17
SASL_AUTHENTICATE_KEY = 36

ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_ILLEGAL_SASL_STATE = 34
ERR_SASL_AUTHENTICATION_FAILED = 58

# Mechanisms advertised by handshake responses. PLAIN is always on;
# the SCRAM pair is appended by the server when a SCRAM credential
# store is configured (protocol/scram.py).
MECHANISMS: tuple[str, ...] = ("PLAIN",)
SCRAM_MECHANISMS: tuple[str, ...] = ("SCRAM-SHA-256", "SCRAM-SHA-512")

# Default session lifetime advertised on successful v1 authenticate:
# 0 means "no re-authentication required". A nonzero lifetime turns on
# KIP-368 re-authentication: the client must re-run the SASL flow on
# the SAME connection before the advertised lifetime elapses, or the
# broker treats the session as unauthenticated (and closes on the next
# non-SASL request, like a real broker's expired-session kill).
SESSION_LIFETIME_MS = 0


@dataclass
class SaslState:
    """Per-connection SASL progress (one instance per TCP connection)."""

    mechanism: str | None = None
    authenticated: bool = False
    authorization_id: str | None = None
    # handshake v0: the next inbound frame is a bare SASL token
    expect_raw_token: bool = False
    # a failed authenticate: deliver the error response, then close
    failed: bool = False
    handshake_version: int | None = None
    # in-flight SCRAM conversation (protocol/scram.py), None for PLAIN
    scram_exchange: object | None = None
    # KIP-368: epoch-ms when the current authentication was granted
    # (re-auth refreshes it); None until first success
    authenticated_at_ms: float | None = None


def parse_plain_token(token: bytes) -> tuple[str, str, str]:
    """Split a SASL/PLAIN token into (authzid, authcid, password).

    RFC 4616: ``[authzid] UTF8NUL authcid UTF8NUL passwd``; empty
    authzid means "derive from authcid"."""
    parts = token.split(b"\x00")
    if len(parts) != 3:
        raise ValueError("PLAIN token must contain exactly two NUL separators")
    authzid, authcid, passwd = (p.decode("utf-8") for p in parts)
    if not authcid:
        raise ValueError("PLAIN token has empty authcid")
    return authzid, authcid, passwd


def check_plain(credentials: dict[str, str], token: bytes, state: SaslState) -> tuple[int, str | None]:
    """Validate a PLAIN token against the credential map; updates state.

    Returns (error_code, error_message)."""
    try:
        authzid, user, passwd = parse_plain_token(token)
    except (ValueError, UnicodeDecodeError):
        state.failed = True
        return ERR_SASL_AUTHENTICATION_FAILED, "malformed PLAIN token"
    # Constant-time compare (and a dummy digest for unknown users) so
    # response timing leaks neither password prefixes nor user existence.
    expected = credentials.get(user, "\x00<no-such-user>")
    if not hmac.compare_digest(expected.encode("utf-8"), passwd.encode("utf-8")):
        state.failed = True
        return ERR_SASL_AUTHENTICATION_FAILED, "invalid credentials"
    import time as _time

    state.authenticated = True
    state.authorization_id = authzid or user
    state.authenticated_at_ms = _time.time() * 1000
    return wire.ERR_NONE, None


def handle_sasl_handshake(
    state: SaslState,
    payload: bytes,
    mechanisms: tuple[str, ...] = MECHANISMS,
    allow_reauth: bool = False,
) -> bytes:
    """SaslHandshake v0/v1 (rigid encoding at every version).

    ``allow_reauth`` (KIP-368, set when the broker advertises a nonzero
    session lifetime) permits a handshake on an ALREADY-authenticated
    connection — the re-authentication entry point. The current
    principal stays valid until the new flow succeeds; a FAILED re-auth
    closes the connection like any auth failure."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    mechanism = r.nullable_string() or ""
    w = wire.Writer()
    w.int32(h.correlation_id)
    if mechanism in mechanisms and (not state.authenticated or allow_reauth):
        if state.authenticated:
            # fresh exchange for the re-auth (SCRAM state is per-flow)
            state.scram_exchange = None
        state.mechanism = mechanism
        state.handshake_version = h.api_version
        # SCRAM needs multiple authenticate round-trips; only the
        # KIP-152 wrapped flow carries them (deviation documented in
        # protocol/scram.py) — v0 raw-token stays PLAIN-only.
        state.expect_raw_token = h.api_version == 0 and mechanism == "PLAIN"
        if h.api_version == 0 and mechanism != "PLAIN":
            state.failed = True
            state.mechanism = None
            w.int16(ERR_ILLEGAL_SASL_STATE)
        else:
            w.int16(wire.ERR_NONE)
    elif state.authenticated:
        # lifetime=0 broker: re-auth not offered — deliver the error
        # and close (without this an attacker gets unlimited retries
        # on a single connection).
        state.failed = True
        w.int16(ERR_ILLEGAL_SASL_STATE)
    else:
        state.failed = True
        w.int16(ERR_UNSUPPORTED_SASL_MECHANISM)
    w.int32(len(mechanisms))
    for m in mechanisms:
        w.nullable_string(m)
    return w.bytes()


def handle_sasl_authenticate(
    state: SaslState,
    credentials: dict[str, str],
    payload: bytes,
    scram_credentials: dict | None = None,
    session_lifetime_ms: int = SESSION_LIFETIME_MS,
) -> bytes:
    """SaslAuthenticate v0/v1 (rigid; the KIP-152 wrapped flow).

    PLAIN completes in one round; SCRAM runs two rounds through the
    same API — the server challenge travels in auth_bytes and the
    final response carries the server signature beside ERR_NONE."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    token = r.nullable_bytes() or b""
    server_token = b""
    if state.mechanism is None or state.expect_raw_token:
        # no (v1) handshake on this connection → illegal state
        err, msg = ERR_ILLEGAL_SASL_STATE, "SaslHandshake v1 must precede authenticate"
        state.failed = True
    elif state.mechanism.startswith("SCRAM-"):
        from kcore_spark.protocol.scram import ScramExchange

        if state.scram_exchange is None:
            state.scram_exchange = ScramExchange(
                state.mechanism, scram_credentials or {}
            )
        ex = state.scram_exchange
        out = ex.server_first(token) if ex.stage == 0 else ex.server_final(token)
        if out is None:
            err, msg = ERR_SASL_AUTHENTICATION_FAILED, ex.error
            state.failed = True
        else:
            err, msg, server_token = wire.ERR_NONE, None, out
            if ex.stage == 2:  # proof verified
                import time as _time

                state.authenticated = True
                state.authorization_id = ex.username
                state.authenticated_at_ms = _time.time() * 1000
                state.scram_exchange = None  # flow complete
    else:
        err, msg = check_plain(credentials, token, state)
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int16(err)
    w.nullable_string(msg)
    w.int32(len(server_token))
    w.raw(server_token)
    if h.api_version >= 1:
        w.int64(session_lifetime_ms)
    return w.bytes()


def handle_raw_token(state: SaslState, credentials: dict[str, str], frame: bytes) -> bytes | None:
    """Legacy handshake-v0 flow: ``frame`` is the bare SASL token (no
    Kafka header). Success answers with an empty frame (the server's
    empty final token); failure closes the connection (None) — v0 has
    no structured way to deliver an error."""
    state.expect_raw_token = False
    err, _msg = check_plain(credentials, frame, state)
    if err != wire.ERR_NONE:
        return None
    return b""

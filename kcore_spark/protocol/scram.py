"""SASL/SCRAM server: SCRAM-SHA-256 and SCRAM-SHA-512 (RFC 5802 /
RFC 7677) over the Kafka SASL flow, plus the credential admin APIs
DescribeUserScramCredentials (key 50) and AlterUserScramCredentials
(key 51).

Closes the challenge-response half of the reference's declared
"Encryption & Authentication" roadmap row
(`/root/reference/README.md:51`; nothing is implemented there).
SASL/PLAIN (protocol/auth.py) sends the password; SCRAM proves
possession without ever transmitting it, and the server itself stores
only ``StoredKey = H(HMAC(SaltedPassword, "Client Key"))`` — a dump of
broker state cannot impersonate a client.

Exchange (both sides stdlib hashlib/hmac — no external deps):

  C: gs2-header 'n,,' + 'n=<user>,r=<cnonce>'
  S: 'r=<cnonce><snonce>,s=<b64 salt>,i=<iterations>'
  C: 'c=biws,r=<full nonce>,p=<b64 ClientProof>'
       ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage)
  S: verify H(ClientProof XOR ClientSignature) == StoredKey
     → 'v=<b64 HMAC(ServerKey, AuthMessage)>'  (mutual auth)

Kafka specifics: the exchange rides SaslAuthenticate v0/v1 frames
after a SaslHandshake v1 naming the mechanism; the server-final token
is delivered in the SAME SaslAuthenticate response as the success
error code. The legacy handshake-v0 raw-token flow is PLAIN-only here
(SCRAM needs multiple raw round-trips; modern clients use v1 —
documented deviation). Credentials are provisioned via
AlterUserScramCredentials exactly like a real broker (kafka-configs
--alter --add-config 'SCRAM-SHA-256=[...]').
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
from dataclasses import dataclass

from kcore_spark.protocol import wire

# Kafka ScramMechanism enum (public protocol): 0=UNKNOWN, 1=SHA-256, 2=SHA-512
MECH_CODES = {"SCRAM-SHA-256": 1, "SCRAM-SHA-512": 2}
MECH_ALGOS = {"SCRAM-SHA-256": "sha256", "SCRAM-SHA-512": "sha512"}
DEFAULT_ITERATIONS = 4096
MIN_ITERATIONS = 4096

ERR_SASL_AUTHENTICATION_FAILED = 58
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_RESOURCE_NOT_FOUND = 91
ERR_UNACCEPTABLE_CREDENTIAL = 93
ERR_INVALID_REQUEST = 42


@dataclass(frozen=True)
class ScramCredential:
    """Server-side verifier (never the password): RFC 5802 §3."""

    salt: bytes
    iterations: int
    stored_key: bytes
    server_key: bytes


def make_credential(
    password: str,
    mechanism: str = "SCRAM-SHA-256",
    salt: bytes | None = None,
    iterations: int = DEFAULT_ITERATIONS,
) -> ScramCredential:
    algo = MECH_ALGOS[mechanism]
    if salt is None:
        salt = os.urandom(16)
    salted = hashlib.pbkdf2_hmac(algo, password.encode("utf-8"), salt, iterations)
    client_key = hmac.new(salted, b"Client Key", algo).digest()
    stored_key = hashlib.new(algo, client_key).digest()
    server_key = hmac.new(salted, b"Server Key", algo).digest()
    return ScramCredential(salt, iterations, stored_key, server_key)


def salted_password_credential(
    salted_password: bytes, mechanism: str, salt: bytes, iterations: int
) -> ScramCredential:
    """Credential from an already-salted password — the form the wire
    API (AlterUserScramCredentials) carries, so the broker never sees
    the cleartext."""
    algo = MECH_ALGOS[mechanism]
    client_key = hmac.new(salted_password, b"Client Key", algo).digest()
    stored_key = hashlib.new(algo, client_key).digest()
    server_key = hmac.new(salted_password, b"Server Key", algo).digest()
    return ScramCredential(salt, iterations, stored_key, server_key)


def _parse_attrs(msg: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in msg.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


class ScramExchange:
    """One connection's SCRAM conversation (two SaslAuthenticate
    round-trips). ``error`` carries the failure reason; a failed
    exchange never authenticates."""

    def __init__(self, mechanism: str, credentials: dict[tuple[str, str], ScramCredential]):
        self.mechanism = mechanism
        self.algo = MECH_ALGOS[mechanism]
        self.credentials = credentials
        self.stage = 0
        self.username: str | None = None
        self.error: str | None = None
        self._client_first_bare = ""
        self._server_first = ""
        self._full_nonce = ""
        self._cred: ScramCredential | None = None
        self._gs2_header = b"n,,"

    # ------------------------------------------------ round 1

    def server_first(self, client_first: bytes) -> bytes | None:
        try:
            text = client_first.decode("utf-8")
        except UnicodeDecodeError:
            self.error = "client-first not UTF-8"
            return None
        # gs2 header: 'n,,' (no channel binding) or 'y,,' (client
        # doesn't know whether we support it — legal since we never
        # advertise -PLUS, RFC 5802 §6). Remember which one so the
        # c= echo in client-final can be checked against the header
        # the client actually sent (ADVICE r7: requiring 'biws' for a
        # 'y,,' client made that flow unauthenticatable).
        if text.startswith("n,,"):
            self._gs2_header = b"n,,"
        elif text.startswith("y,,"):
            self._gs2_header = b"y,,"
        else:
            self.error = "unsupported gs2 channel binding"
            return None
        bare = text.split(",,", 1)[1]
        attrs = _parse_attrs(bare)
        user, cnonce = attrs.get("n"), attrs.get("r")
        if not user or not cnonce:
            self.error = "missing n=/r= in client-first"
            return None
        self.username = user
        self._client_first_bare = bare
        cred = self.credentials.get((user, self.mechanism))
        if cred is None:
            # RFC-compliant user-hiding would answer with a fake salt;
            # Kafka answers SASL_AUTHENTICATION_FAILED on client-final —
            # we proceed with a deterministic dummy credential so the
            # flow (and its timing) is uniform, then fail the proof.
            dummy_salt = hashlib.sha256(user.encode()).digest()[:16]
            cred = make_credential("\x00<no-such-user>", self.mechanism, dummy_salt, MIN_ITERATIONS)
            self._no_user = True
        else:
            self._no_user = False
        self._cred = cred
        self._full_nonce = cnonce + base64.b64encode(os.urandom(18)).decode()
        self._server_first = (
            f"r={self._full_nonce},s={base64.b64encode(cred.salt).decode()},"
            f"i={cred.iterations}"
        )
        self.stage = 1
        return self._server_first.encode("utf-8")

    # ------------------------------------------------ round 2

    def server_final(self, client_final: bytes) -> bytes | None:
        if self.stage != 1 or self._cred is None:
            self.error = "client-final before server-first"
            return None
        try:
            text = client_final.decode("utf-8")
        except UnicodeDecodeError:
            self.error = "client-final not UTF-8"
            return None
        attrs = _parse_attrs(text)
        cb, nonce, proof_b64 = attrs.get("c"), attrs.get("r"), attrs.get("p")
        # c= must echo the exact gs2 header from client-first
        # ('biws' for 'n,,', 'eSws' for 'y,,')
        if cb != base64.b64encode(self._gs2_header).decode():
            self.error = "channel-binding mismatch"
            return None
        if nonce != self._full_nonce:
            self.error = "nonce mismatch"
            return None
        if not proof_b64:
            self.error = "missing proof"
            return None
        try:
            proof = base64.b64decode(proof_b64, validate=True)
        except Exception:
            self.error = "proof not base64"
            return None
        without_proof = text.rsplit(",p=", 1)[0]
        auth_message = (
            f"{self._client_first_bare},{self._server_first},{without_proof}"
        ).encode("utf-8")
        client_signature = hmac.new(self._cred.stored_key, auth_message, self.algo).digest()
        if len(proof) != len(client_signature):
            self.error = "proof length mismatch"
            return None
        client_key = bytes(a ^ b for a, b in zip(proof, client_signature))
        recovered = hashlib.new(self.algo, client_key).digest()
        if self._no_user or not hmac.compare_digest(recovered, self._cred.stored_key):
            self.error = "invalid credentials"
            return None
        server_signature = hmac.new(self._cred.server_key, auth_message, self.algo).digest()
        self.stage = 2
        return f"v={base64.b64encode(server_signature).decode()}".encode("utf-8")


# ------------------------------------------------------------------
# Client side (tests + embedded consumers): proves the exchange against
# an independent implementation of the same RFC math.


class ScramClient:
    def __init__(self, user: str, password: str, mechanism: str = "SCRAM-SHA-256"):
        self.user, self.password = user, password
        self.mechanism = mechanism
        self.algo = MECH_ALGOS[mechanism]
        self.cnonce = base64.b64encode(os.urandom(18)).decode()
        self._bare = f"n={user},r={self.cnonce}"
        self._server_first = ""

    def first(self) -> bytes:
        return f"n,,{self._bare}".encode()

    def final(self, server_first: bytes) -> bytes:
        self._server_first = server_first.decode("utf-8")
        attrs = _parse_attrs(self._server_first)
        nonce, salt, iters = attrs["r"], base64.b64decode(attrs["s"]), int(attrs["i"])
        assert nonce.startswith(self.cnonce), "server dropped client nonce"
        salted = hashlib.pbkdf2_hmac(self.algo, self.password.encode(), salt, iters)
        client_key = hmac.new(salted, b"Client Key", self.algo).digest()
        stored_key = hashlib.new(self.algo, client_key).digest()
        without_proof = f"c=biws,r={nonce}"
        auth_message = f"{self._bare},{self._server_first},{without_proof}".encode()
        client_sig = hmac.new(stored_key, auth_message, self.algo).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        self._server_key = hmac.new(salted, b"Server Key", self.algo).digest()
        self._auth_message = auth_message
        return f"{without_proof},p={base64.b64encode(proof).decode()}".encode()

    def verify_server(self, server_final: bytes) -> bool:
        attrs = _parse_attrs(server_final.decode("utf-8"))
        want = hmac.new(self._server_key, self._auth_message, self.algo).digest()
        return hmac.compare_digest(base64.b64decode(attrs.get("v", "")), want)


# ------------------------------------------------------------------
# Admin wire APIs (flexible-only, header v2)

DESCRIBE_USER_SCRAM_KEY = 50
ALTER_USER_SCRAM_KEY = 51


ERR_CLUSTER_AUTHORIZATION_FAILED = 31


def handle_describe_user_scram(
    store: dict[tuple[str, str], ScramCredential],
    payload: bytes,
    authorized: bool = True,
) -> bytes:
    """DescribeUserScramCredentials v0: per-user mechanism+iteration
    inventory (never key material). Null users array = all users.
    ``authorized`` is the caller's DESCRIBE-on-Cluster verdict (real
    brokers gate this API the same way); False answers the top-level
    error without touching the store."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    if not authorized:
        w = wire.Writer()
        w.int32(h.correlation_id)
        w.empty_tagged_fields()
        w.int32(0)  # throttle
        w.int16(ERR_CLUSTER_AUTHORIZATION_FAILED)
        w.compact_string("Cluster authorization failed")
        w.compact_array_len(0)
        w.empty_tagged_fields()
        return w.bytes()
    n = r.compact_array_len()
    wanted: list[str] | None
    if n < 0:
        wanted = None
    else:
        wanted = []
        for _ in range(n):
            wanted.append(r.compact_string() or "")
            r.tagged_fields()
    r.tagged_fields()
    by_user: dict[str, list[tuple[int, int]]] = {}
    for (user, mech), cred in sorted(store.items()):
        by_user.setdefault(user, []).append((MECH_CODES[mech], cred.iterations))
    names = sorted(by_user) if wanted is None else sorted(set(wanted))
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()
    w.int32(0)  # throttle
    w.int16(wire.ERR_NONE)  # top-level error
    w.compact_string(None)  # top-level message
    w.compact_array_len(len(names))
    for user in names:
        infos = by_user.get(user)
        w.compact_string(user)
        if infos is None:
            w.int16(ERR_RESOURCE_NOT_FOUND)
            w.compact_string(f"no SCRAM credentials for {user!r}")
            w.compact_array_len(0)
        else:
            w.int16(wire.ERR_NONE)
            w.compact_string(None)
            w.compact_array_len(len(infos))
            for code, iters in infos:
                w.int8(code)
                w.int32(iters)
                w.empty_tagged_fields()
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def handle_alter_user_scram(
    store: dict[tuple[str, str], ScramCredential] | None,
    payload: bytes,
    authorized: bool = True,
) -> bytes:
    """AlterUserScramCredentials v0: deletions then upsertions, each
    result per (user). Upsertions carry (mechanism, iterations, salt,
    SALTED password) — the broker derives and stores only the verifier
    keys, like a real broker.

    Security posture (ADVICE r7): ``authorized`` is the caller's
    ALTER-on-Cluster verdict — without it, an authenticated principal
    could upsert another user's password and assume their ACLs. And
    ``store=None`` means SCRAM was not configured at construction:
    the request is REJECTED rather than lazily creating a store,
    because a data-plane request must never flip the listener's
    authentication posture."""
    code_to_mech = {v: k for k, v in MECH_CODES.items()}
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    results: list[tuple[str, int, str | None]] = []
    deletions = []
    for _ in range(max(r.compact_array_len(), 0)):
        user = r.compact_string() or ""
        mech_code = r.int8()
        r.tagged_fields()
        deletions.append((user, mech_code))
    upsertions = []
    for _ in range(max(r.compact_array_len(), 0)):
        user = r.compact_string() or ""
        mech_code = r.int8()
        iterations = r.int32()
        salt = r.compact_bytes() or b""
        salted_password = r.compact_bytes() or b""
        r.tagged_fields()
        upsertions.append((user, mech_code, iterations, salt, salted_password))
    r.tagged_fields()
    if not authorized or store is None:
        err, msg = (
            (ERR_CLUSTER_AUTHORIZATION_FAILED, "Cluster authorization failed")
            if not authorized
            else (ERR_INVALID_REQUEST, "SCRAM not enabled on this listener")
        )
        for user, _mech in deletions:
            results.append((user, err, msg))
        for user, _mech, _i, _s, _p in upsertions:
            results.append((user, err, msg))
        w = wire.Writer()
        w.int32(h.correlation_id)
        w.empty_tagged_fields()
        w.int32(0)  # throttle
        w.compact_array_len(len(results))
        for user, e, m in results:
            w.compact_string(user)
            w.int16(e)
            w.compact_string(m)
            w.empty_tagged_fields()
        w.empty_tagged_fields()
        return w.bytes()
    for user, mech_code in deletions:
        mech = code_to_mech.get(mech_code)
        if mech is None:
            results.append((user, ERR_UNSUPPORTED_SASL_MECHANISM, "unknown mechanism"))
        elif (user, mech) not in store:
            results.append((user, ERR_RESOURCE_NOT_FOUND, "no such credential"))
        else:
            del store[(user, mech)]
            results.append((user, wire.ERR_NONE, None))
    for user, mech_code, iterations, salt, salted_password in upsertions:
        mech = code_to_mech.get(mech_code)
        if mech is None:
            results.append((user, ERR_UNSUPPORTED_SASL_MECHANISM, "unknown mechanism"))
        elif iterations < MIN_ITERATIONS or not salt or not salted_password:
            results.append(
                (user, ERR_UNACCEPTABLE_CREDENTIAL, "iterations/salt/password unacceptable")
            )
        else:
            store[(user, mech)] = salted_password_credential(
                salted_password, mech, salt, iterations
            )
            results.append((user, wire.ERR_NONE, None))
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()
    w.int32(0)  # throttle
    w.compact_array_len(len(results))
    for user, err, msg in results:
        w.compact_string(user)
        w.int16(err)
        w.compact_string(msg)
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()

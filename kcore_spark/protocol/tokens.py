"""Delegation tokens (KIP-48): CreateDelegationToken k38 v0-v3,
RenewDelegationToken k39 v0-v2, ExpireDelegationToken k40 v0-v2,
DescribeDelegationToken k41 v0-v3 — the lightweight auth mechanism a
large Spark/stream-processing job uses so every executor doesn't need
the principal's Kerberos/SCRAM secret.

Schemas follow the upstream protocol JSON (flexible from v2 for all
four APIs; v3 of create/describe adds the KIP-373 token-requester /
owned-by-others fields). The reference implements none of this — its
only API is ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:
106-125`); the declared "Encryption & auth" roadmap row
(`/root/reference/README.md`) is the parity hook.

Semantics mirrored from the public broker behavior:
- no `delegation.token.secret.key` configured → every token API
  answers DELEGATION_TOKEN_AUTH_DISABLED (61);
- the HMAC is HMAC-SHA512(secret, token_id) — possession of the hmac
  IS the credential, so renew/expire look tokens up by hmac;
- expiry walks min(now + period, max_timestamp); a negative expire
  period revokes immediately (the logout path);
- owners and renewers are (principal_type, principal_name) pairs;
  only the owner, the token requester, or a listed renewer may renew
  or expire (DELEGATION_TOKEN_OWNER_MISMATCH 63 otherwise);
- an expired token answers DELEGATION_TOKEN_EXPIRED (66);
- KIP-373: creating a token for ANOTHER owner (v3 owner fields) is
  gated by the caller's CREATE_TOKENS authorization when an ACL store
  is configured (authorization off without one, matching the repo's
  data-plane stance);
- describe filters by owner when the request carries an owner list,
  and an unauthenticated (ANONYMOUS) caller cannot create tokens
  (DELEGATION_TOKEN_REQUEST_NOT_ALLOWED 64) — real brokers refuse
  token creation over unauthenticated channels.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import time
import uuid
from dataclasses import dataclass, field

from kcore_spark.protocol import wire

ERR_DELEGATION_TOKEN_AUTH_DISABLED = 61
ERR_DELEGATION_TOKEN_NOT_FOUND = 62
ERR_DELEGATION_TOKEN_OWNER_MISMATCH = 63
ERR_DELEGATION_TOKEN_REQUEST_NOT_ALLOWED = 64
ERR_DELEGATION_TOKEN_EXPIRED = 66

DEFAULT_MAX_LIFETIME_MS = 7 * 24 * 3600 * 1000  # delegation.token.max.lifetime.ms
DEFAULT_RENEW_MS = 24 * 3600 * 1000  # delegation.token.expiry.time.ms

CREATE_KEY = 38
RENEW_KEY = 39
EXPIRE_KEY = 40
DESCRIBE_KEY = 41


@dataclass
class TokenInfo:
    token_id: str
    hmac: bytes
    owner: tuple[str, str]
    requester: tuple[str, str]
    renewers: list[tuple[str, str]]
    issue_ms: int
    expiry_ms: int
    max_ms: int


class DelegationTokenStore:
    """In-memory token registry keyed by token id, looked up by hmac
    (the credential a renew/expire request actually carries)."""

    def __init__(self, secret: bytes | None = None):
        self.secret = secret
        self.tokens: dict[str, TokenInfo] = {}

    @property
    def enabled(self) -> bool:
        return self.secret is not None

    def _hmac(self, token_id: str) -> bytes:
        return hmac_mod.new(self.secret, token_id.encode(), hashlib.sha512).digest()

    def create(
        self,
        owner: tuple[str, str],
        requester: tuple[str, str],
        renewers: list[tuple[str, str]],
        max_lifetime_ms: int,
        now_ms: int,
    ) -> TokenInfo:
        token_id = str(uuid.uuid4())
        max_life = (
            min(max_lifetime_ms, DEFAULT_MAX_LIFETIME_MS)
            if max_lifetime_ms > 0
            else DEFAULT_MAX_LIFETIME_MS
        )
        info = TokenInfo(
            token_id=token_id,
            hmac=self._hmac(token_id),
            owner=owner,
            requester=requester,
            renewers=renewers,
            issue_ms=now_ms,
            expiry_ms=min(now_ms + DEFAULT_RENEW_MS, now_ms + max_life),
            max_ms=now_ms + max_life,
        )
        self.tokens[token_id] = info
        return info

    def by_hmac(self, h: bytes) -> TokenInfo | None:
        for t in self.tokens.values():
            if hmac_mod.compare_digest(t.hmac, h):
                return t
        return None

    @staticmethod
    def may_manage(t: TokenInfo, principal: tuple[str, str]) -> bool:
        return principal == t.owner or principal == t.requester or principal in t.renewers


def _now_ms(now_ms: int | None) -> int:
    return int(time.time() * 1000) if now_ms is None else now_ms


def _principal_pair(principal: str) -> tuple[str, str]:
    """'User:alice' → ('User', 'alice')."""
    ptype, _, name = principal.partition(":")
    return (ptype or "User", name)


def handle_create(
    store: DelegationTokenStore,
    payload: bytes,
    principal: str = "User:ANONYMOUS",
    authorize_other=None,
    now_ms: int | None = None,
) -> bytes:
    v = int.from_bytes(payload[2:4], "big", signed=True)
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    owner_req: tuple[str, str] | None = None
    if v >= 3:
        ot, on = rd_str(), rd_str()
        if ot is not None and on is not None:
            owner_req = (ot, on)
    renewers = []
    for _ in range(max(rd_len(), 0)):
        renewers.append((rd_str() or "", rd_str() or ""))
        if flex:
            r.tagged_fields()
    max_lifetime_ms = r.int64()
    if flex:
        r.tagged_fields()

    requester = _principal_pair(principal)
    owner = owner_req or requester
    err = wire.ERR_NONE
    if not store.enabled:
        err = ERR_DELEGATION_TOKEN_AUTH_DISABLED
    elif requester[1] == "ANONYMOUS":
        err = ERR_DELEGATION_TOKEN_REQUEST_NOT_ALLOWED
    elif owner != requester and authorize_other is not None and not authorize_other(owner):
        err = ERR_DELEGATION_TOKEN_OWNER_MISMATCH

    now = _now_ms(now_ms)
    if err == wire.ERR_NONE:
        info = store.create(owner, requester, renewers, max_lifetime_ms, now)
    else:
        info = TokenInfo("", b"", owner, requester, [], 0, 0, 0)

    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    w.int16(err)
    wr_str = w.compact_string if flex else w.nullable_string
    wr_bytes = w.compact_bytes if flex else w.nullable_bytes
    wr_str(info.owner[0])
    wr_str(info.owner[1])
    if v >= 3:
        wr_str(info.requester[0])
        wr_str(info.requester[1])
    w.int64(info.issue_ms)
    w.int64(info.expiry_ms)
    w.int64(info.max_ms)
    wr_str(info.token_id)
    wr_bytes(info.hmac)
    w.int32(0)  # throttle_time_ms (trailing for this API per the spec)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def _renew_or_expire(
    store: DelegationTokenStore,
    payload: bytes,
    principal: str,
    now_ms: int | None,
    expire: bool,
) -> bytes:
    v = int.from_bytes(payload[2:4], "big", signed=True)
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    hmac_bytes = (r.compact_bytes() if flex else r.nullable_bytes()) or b""
    period_ms = r.int64()
    if flex:
        r.tagged_fields()

    now = _now_ms(now_ms)
    err = wire.ERR_NONE
    expiry = -1
    if not store.enabled:
        err = ERR_DELEGATION_TOKEN_AUTH_DISABLED
    else:
        t = store.by_hmac(hmac_bytes)
        if t is None:
            err = ERR_DELEGATION_TOKEN_NOT_FOUND
        elif not store.may_manage(t, _principal_pair(principal)):
            err = ERR_DELEGATION_TOKEN_OWNER_MISMATCH
        elif t.expiry_ms < now:
            err = ERR_DELEGATION_TOKEN_EXPIRED
        elif expire and period_ms < 0:
            del store.tokens[t.token_id]  # immediate revoke (logout)
            expiry = now
        else:
            # A zero period is an explicit "expire now" on BOTH paths
            # (upstream only substitutes the default renew window for
            # NEGATIVE periods — ADVICE r8); renew with a negative
            # period falls back to the configured renew window.
            if expire:
                t.expiry_ms = min(now + period_ms, t.max_ms)
            else:
                t.expiry_ms = min(
                    now + (period_ms if period_ms >= 0 else DEFAULT_RENEW_MS), t.max_ms
                )
            expiry = t.expiry_ms

    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    w.int16(err)
    w.int64(expiry)
    w.int32(0)  # throttle_time_ms
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def handle_renew(store, payload, principal="User:ANONYMOUS", now_ms=None) -> bytes:
    return _renew_or_expire(store, payload, principal, now_ms, expire=False)


def handle_expire(store, payload, principal="User:ANONYMOUS", now_ms=None) -> bytes:
    return _renew_or_expire(store, payload, principal, now_ms, expire=True)


def handle_describe(
    store: DelegationTokenStore,
    payload: bytes,
    principal: str = "User:ANONYMOUS",
    authorize_describe=None,
    now_ms: int | None = None,
) -> bytes:
    """Describe is credential-revealing (the response carries each
    token's HMAC, and possession of the hmac IS the credential), so it
    is gated like create: ANONYMOUS callers are refused outright, and
    a caller only sees tokens it owns / requested / may renew unless
    the ACL authorizer grants DESCRIBE_TOKENS on the owner (when no
    ACL store is configured ``authorize_describe`` is None =
    authorization off, the same stance as handle_create's
    ``authorize_other``). Expired tokens are garbage-collected on
    access — the upstream broker's cleanup-pass equivalent — so a dead
    token never reappears in a listing (ADVICE r8)."""
    v = int.from_bytes(payload[2:4], "big", signed=True)
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    n_owners = (r.compact_array_len() if flex else r.int32())
    owners: list[tuple[str, str]] | None = None
    if n_owners >= 0:
        owners = []
        for _ in range(n_owners):
            owners.append((rd_str() or "", rd_str() or ""))
            if flex:
                r.tagged_fields()
    if flex:
        r.tagged_fields()

    caller = _principal_pair(principal)
    now = _now_ms(now_ms)
    err = wire.ERR_NONE if store.enabled else ERR_DELEGATION_TOKEN_AUTH_DISABLED
    if err == wire.ERR_NONE and caller[1] == "ANONYMOUS":
        err = ERR_DELEGATION_TOKEN_REQUEST_NOT_ALLOWED
    toks: list[TokenInfo] = []
    if err == wire.ERR_NONE:
        for t in list(store.tokens.values()):
            if t.expiry_ms < now:  # GC expired tokens on access
                del store.tokens[t.token_id]
                continue
            if owners is not None and t.owner not in owners:
                continue
            if not (
                DelegationTokenStore.may_manage(t, caller)
                or authorize_describe is None
                or authorize_describe(t.owner)
            ):
                continue
            toks.append(t)
        toks.sort(key=lambda t: t.issue_ms)

    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    w.int16(err)
    wr_str = w.compact_string if flex else w.nullable_string
    wr_bytes = w.compact_bytes if flex else w.nullable_bytes
    if flex:
        w.compact_array_len(len(toks))
    else:
        w.int32(len(toks))
    for t in toks:
        wr_str(t.owner[0])
        wr_str(t.owner[1])
        if v >= 3:
            wr_str(t.requester[0])
            wr_str(t.requester[1])
        w.int64(t.issue_ms)
        w.int64(t.expiry_ms)
        w.int64(t.max_ms)
        wr_str(t.token_id)
        wr_bytes(t.hmac)
        if flex:
            w.compact_array_len(len(t.renewers))
        else:
            w.int32(len(t.renewers))
        for rt, rn in t.renewers:
            wr_str(rt)
            wr_str(rn)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    if flex:
        w.empty_tagged_fields()
    return w.bytes()

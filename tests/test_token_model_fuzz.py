"""Model-based fuzz of the delegation-token lifecycle (KIP-48,
`protocol/tokens.py`) — campaign D of the r13 fuzz round.

Random interleavings of create (random owner/renewers/max-lifetime),
renew and expire (negative/zero/positive periods), clock advances,
management attempts by the wrong principal, and fabricated hmacs —
driven through the wire handlers with an injected clock, with the
store's full token table compared against an independent model after
every step. Invariants:

- expiry/max arithmetic matches the model exactly (renew and
  positive-period expire are both clamped to max_ms; zero period is
  an explicit expire-now on both paths; negative renew substitutes
  the default window; negative expire revokes immediately);
- only owner/requester/renewers may manage; an expired-but-not-GCed
  token answers EXPIRED; an unknown hmac answers NOT_FOUND; every
  error path leaves the table untouched;
- a fabricated hmac (right length, wrong bytes) never manages any
  token.
"""

from __future__ import annotations

import random

import pytest

from kcore_spark.protocol import tokens

from tests.test_delegation_tokens import (
    _create_req,
    _parse_create,
    _parse_renew,
    _renew_req,
)

SECRET = b"fuzz-secret"
PRINCIPALS = ["User:alice", "User:bob", "User:carol"]


class TModel:
    def __init__(self):
        self.tokens: dict[str, dict] = {}  # token_id -> fields

    def snapshot(self):
        return {
            tid: (t["expiry"], t["max"], t["owner"], tuple(t["renewers"]))
            for tid, t in self.tokens.items()
        }


def _mk(store, model, now, principal, renewers, max_life):
    resp = tokens.handle_create(
        store,
        _create_req(3, renewers=renewers, max_lifetime_ms=max_life),
        principal=principal,
        now_ms=now,
    )
    out = _parse_create(resp, 3)
    assert out["error"] == 0
    eff_max = (
        min(max_life, tokens.DEFAULT_MAX_LIFETIME_MS)
        if max_life > 0
        else tokens.DEFAULT_MAX_LIFETIME_MS
    )
    want_expiry = min(now + tokens.DEFAULT_RENEW_MS, now + eff_max)
    assert out["issue"] == now and out["expiry"] == want_expiry
    assert out["max"] == now + eff_max
    model.tokens[out["token_id"]] = {
        "hmac": out["hmac"],
        "owner": principal,
        "renewers": [f"{t}:{n}" for t, n in renewers],
        "expiry": want_expiry,
        "max": now + eff_max,
    }
    return out


def _store_table(store):
    return {
        tid: (t.expiry_ms, t.max_ms, f"{t.owner[0]}:{t.owner[1]}",
              tuple(f"{rt}:{rn}" for rt, rn in t.renewers))
        for tid, t in store.tokens.items()
    }


@pytest.mark.parametrize("seed", [2, 15, 33, 49, 77])
def test_token_lifecycle_model_fuzz(seed):
    rng = random.Random(seed)
    store = tokens.DelegationTokenStore(SECRET)
    model = TModel()
    now = 1_700_000_000_000

    for _step in range(250):
        action = rng.choices(
            ["create", "renew", "expire", "clock", "wrong_principal", "bad_hmac"],
            weights=[10, 22, 16, 18, 10, 6],
        )[0]
        live = list(model.tokens)

        if action == "create" or not live:
            principal = rng.choice(PRINCIPALS)
            renewers = (
                [("User", rng.choice(["bob", "carol"]))] if rng.random() < 0.5 else []
            )
            max_life = rng.choice([-1, 60_000, 3_600_000, 10**13])
            _mk(store, model, now, principal, renewers, max_life)
        elif action == "renew":
            tid = rng.choice(live)
            t = model.tokens[tid]
            manager = t["owner"]
            period = rng.choice([-1, 0, 30_000, 7_200_000])
            out = _parse_renew(
                tokens.handle_renew(
                    store,
                    _renew_req(tokens.RENEW_KEY, 2, t["hmac"], period),
                    principal=manager,
                    now_ms=now,
                ),
                2,
            )
            if t["expiry"] < now:
                assert out["error"] == tokens.ERR_DELEGATION_TOKEN_EXPIRED
            else:
                assert out["error"] == 0
                eff = period if period >= 0 else tokens.DEFAULT_RENEW_MS
                t["expiry"] = min(now + eff, t["max"])
                assert out["expiry"] == t["expiry"]
        elif action == "expire":
            tid = rng.choice(live)
            t = model.tokens[tid]
            manager = (
                rng.choice(t["renewers"]) if t["renewers"] and rng.random() < 0.4
                else t["owner"]
            )
            period = rng.choice([-1, 0, 45_000])
            out = _parse_renew(
                tokens.handle_expire(
                    store,
                    _renew_req(tokens.EXPIRE_KEY, 2, t["hmac"], period),
                    principal=manager,
                    now_ms=now,
                ),
                2,
            )
            if t["expiry"] < now:
                assert out["error"] == tokens.ERR_DELEGATION_TOKEN_EXPIRED
            elif period < 0:
                assert out["error"] == 0 and out["expiry"] == now
                del model.tokens[tid]  # immediate revoke
            else:
                assert out["error"] == 0
                t["expiry"] = min(now + period, t["max"])
                assert out["expiry"] == t["expiry"]
        elif action == "clock":
            now += rng.choice([10_000, 100_000, 3_600_000, 86_400_000])
        elif action == "wrong_principal":
            tid = rng.choice(live)
            t = model.tokens[tid]
            managers = {t["owner"], *t["renewers"]}
            outsiders = [p for p in PRINCIPALS if p not in managers]
            if outsiders:
                before = model.snapshot()
                out = _parse_renew(
                    tokens.handle_renew(
                        store,
                        _renew_req(tokens.RENEW_KEY, 2, t["hmac"], 60_000),
                        principal=rng.choice(outsiders),
                        now_ms=now,
                    ),
                    2,
                )
                assert out["error"] == tokens.ERR_DELEGATION_TOKEN_OWNER_MISMATCH
                assert _store_table(store) == before, "error path mutated state"
        elif action == "bad_hmac":
            before = model.snapshot()
            fake = bytes(64)  # right length, wrong bytes
            out = _parse_renew(
                tokens.handle_renew(
                    store,
                    _renew_req(tokens.RENEW_KEY, 2, fake, 60_000),
                    principal=rng.choice(PRINCIPALS),
                    now_ms=now,
                ),
                2,
            )
            assert out["error"] == tokens.ERR_DELEGATION_TOKEN_NOT_FOUND
            assert _store_table(store) == before

        assert _store_table(store) == model.snapshot(), "token table diverged"

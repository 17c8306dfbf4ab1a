"""Model-based fuzz of quota accounting (`protocol/quotas.py`) —
campaign Q of the r13 fuzz round.

Random quota configurations (exact user/client-id entities and type
defaults, set and cleared mid-run), random record_and_throttle calls
with mixed entities and byte sizes, and clock advances are mirrored
against an independent model of the windowed accounting:

- resolution: exact entity first, then the type default; a <=0 limit
  never throttles;
- per-(entity, key) 1s windows reset when expired; bytes accumulate
  within a window;
- throttle = max over matching entities of over/limit*1000 ms, 0
  when under every quota;
- reconfiguration applies to the NEXT record (windows keyed by
  entity, not by limit);
- the window table stays bounded under distinct-client-id churn
  (the ADVICE r7 eviction).
"""

from __future__ import annotations

import random

import pytest

from kcore_spark.protocol.quotas import WINDOW_MS, QuotaManager

KEY = "producer_byte_rate"
USERS = ["alice", "bob", None]
CLIENTS = ["app-1", "app-2", None]


class QModel:
    def __init__(self):
        self.quotas: dict[tuple[str, str | None], float | None] = {}
        self.windows: dict[tuple[str, str], tuple[int, int]] = {}  # (etype, ename) -> (start, bytes)

    def set_quota(self, etype, ename, value):
        if value is None:
            self.quotas.pop((etype, ename), None)
        else:
            self.quotas[(etype, ename)] = float(value)

    def limit_for(self, etype, ename):
        for ent in ((etype, ename), (etype, None)):
            if ent in self.quotas:
                return self.quotas[ent]
        return None

    def record(self, nbytes, now, user, client):
        throttle = 0
        for etype, ename in (("user", user), ("client-id", client)):
            if ename is None:
                continue
            limit = self.limit_for(etype, ename)
            if limit is None or limit <= 0:
                continue
            wkey = (etype, ename)
            start, b = self.windows.get(wkey, (None, 0))
            if start is None or now - start >= WINDOW_MS:
                start, b = now, 0
            b += nbytes
            self.windows[wkey] = (start, b)
            over = b - limit * (WINDOW_MS / 1000.0)
            if over > 0:
                throttle = max(throttle, int(over / limit * 1000))
        return throttle


@pytest.mark.parametrize("seed", [4, 18, 36, 57])
def test_quota_accounting_matches_model(seed):
    rng = random.Random(seed)
    qm = QuotaManager()
    model = QModel()
    now = 1_000_000

    for _step in range(400):
        action = rng.choices(
            ["record", "set", "clear", "clock"], weights=[24, 6, 3, 10]
        )[0]
        if action == "record":
            user = rng.choice(USERS)
            client = rng.choice(CLIENTS)
            nbytes = rng.randint(1, 5000)
            got = qm.record_and_throttle(KEY, nbytes, now, user=user, client_id=client)
            want = model.record(nbytes, now, user, client)
            assert got == want, (
                f"throttle mismatch: got {got}, want {want} "
                f"(user={user}, client={client}, nbytes={nbytes})"
            )
        elif action == "set":
            etype = rng.choice(["user", "client-id"])
            ename = rng.choice(
                ["alice", "bob", None] if etype == "user" else ["app-1", "app-2", None]
            )
            value = rng.choice([512.0, 2048.0, 10_000.0, 0.0])
            qm.set_quota(etype, ename, KEY, value)
            model.set_quota(etype, ename, value)
        elif action == "clear":
            etype = rng.choice(["user", "client-id"])
            ename = rng.choice(
                ["alice", "bob", None] if etype == "user" else ["app-1", "app-2", None]
            )
            qm.set_quota(etype, ename, KEY, None)
            model.set_quota(etype, ename, None)
        elif action == "clock":
            now += rng.choice([100, 400, WINDOW_MS, 3 * WINDOW_MS])


def test_window_table_bounded_under_client_id_churn():
    """Distinct attacker-controlled client-ids must not grow the window
    table unboundedly once a default quota exists (ADVICE r7)."""
    qm = QuotaManager()
    qm.set_quota("client-id", None, KEY, 1000.0)
    now = 0
    for i in range(10_000):
        now += 2 * WINDOW_MS  # every previous window is expired
        qm.record_and_throttle(KEY, 10, now, client_id=f"cid-{i}")
    assert len(qm._windows) <= 4200, len(qm._windows)

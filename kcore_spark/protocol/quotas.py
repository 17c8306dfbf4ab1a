"""Client quotas: DescribeClientQuotas (API key 48, v0) and
AlterClientQuotas (API key 49, v0), plus byte-rate enforcement
surfaced through the throttle_time_ms field of Produce/Fetch
responses — Kafka's per-principal backpressure contract (KIP-124).

The reference declares no quota machinery (nothing beyond ApiVersions,
`/root/reference/pkg/kafka/kafka_api.go:106-125`); this realizes the
public protocol semantics:

- quota ENTITIES are (entity_type, entity_name) pairs — ``user`` and
  ``client-id`` here — with ``entity_name = None`` meaning the DEFAULT
  quota for that type; an exact entity match overrides the default
  (Kafka's resolution order, simplified to the two single-entity
  levels).
- quota KEYS: ``producer_byte_rate`` / ``consumer_byte_rate``
  (bytes/second).
- enforcement is a fixed 1-second sampling window per (entity, key):
  bytes are recorded as requests arrive; once a window's bytes exceed
  the limit, the response carries
  ``throttle_time_ms = overage / limit × 1000`` — the time the client
  must back off for the observed rate to fall to the quota, exactly
  the number a real broker computes, deterministic given (bytes,
  now_ms). The single-process embedded broker REPORTS throttle and
  relies on well-behaved clients honoring it (real brokers also mute
  the channel; noted, not simulated — the event loop here is shared).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from kcore_spark.protocol import wire

DESCRIBE_CLIENT_QUOTAS_KEY = 48
ALTER_CLIENT_QUOTAS_KEY = 49

PRODUCER_BYTE_RATE = "producer_byte_rate"
CONSUMER_BYTE_RATE = "consumer_byte_rate"
VALID_KEYS = (PRODUCER_BYTE_RATE, CONSUMER_BYTE_RATE)
VALID_ENTITY_TYPES = ("user", "client-id")

ERR_INVALID_REQUEST = 42

# DescribeClientQuotas component match types (public enum)
MATCH_EXACT, MATCH_DEFAULT, MATCH_ANY = 0, 1, 2

WINDOW_MS = 1000


@dataclass
class _Window:
    start_ms: int = 0
    bytes: int = 0


@dataclass
class QuotaManager:
    # (entity_type, entity_name-or-None for default) -> {key: limit}
    quotas: dict[tuple[str, str | None], dict[str, float]] = field(default_factory=dict)
    _windows: dict[tuple[str, str | None, str], _Window] = field(default_factory=dict)

    # ------------------------------------------------------ config

    def set_quota(self, entity_type: str, entity_name: str | None, key: str, value: float | None) -> None:
        ent = (entity_type, entity_name)
        cfg = self.quotas.setdefault(ent, {})
        if value is None:
            cfg.pop(key, None)
            if not cfg:
                self.quotas.pop(ent, None)
        else:
            cfg[key] = float(value)

    def limit_for(self, entity_type: str, entity_name: str | None, key: str) -> float | None:
        """Exact entity first, then the type default — Kafka's
        two-level resolution for a single entity type."""
        for ent in ((entity_type, entity_name), (entity_type, None)):
            v = self.quotas.get(ent, {}).get(key)
            if v is not None:
                return v
        return None

    # ------------------------------------------------------ enforcement

    def record_and_throttle(
        self,
        key: str,
        nbytes: int,
        now_ms: int,
        user: str | None = None,
        client_id: str | None = None,
    ) -> int:
        """Record ``nbytes`` against every matching entity and return
        the throttle_time_ms the response must carry (max over
        entities; 0 when under every quota).

        Windows for entities that stopped sending are evicted once
        expired (client-id is attacker-controlled request-header text,
        so with a default quota configured the window dict would
        otherwise grow one entry per distinct client-id forever —
        ADVICE r7). Amortized: prune only past a size threshold."""
        if len(self._windows) > 4096:
            stale = [
                k for k, w in self._windows.items()
                if now_ms - w.start_ms >= WINDOW_MS
            ]
            for k in stale:
                del self._windows[k]
        throttle = 0
        for etype, ename in (("user", user), ("client-id", client_id)):
            if ename is None:
                continue
            limit = self.limit_for(etype, ename, key)
            if limit is None or limit <= 0:
                continue
            wkey = (etype, ename, key)
            win = self._windows.get(wkey)
            if win is None or now_ms - win.start_ms >= WINDOW_MS:
                win = _Window(start_ms=now_ms, bytes=0)
                self._windows[wkey] = win
            win.bytes += nbytes
            over = win.bytes - limit * (WINDOW_MS / 1000.0)
            if over > 0:
                throttle = max(throttle, int(over / limit * 1000))
        return throttle


# ------------------------------------------------------ wire handlers


ERR_CLUSTER_AUTHORIZATION_FAILED = 31


def handle_alter_client_quotas(
    qm: QuotaManager, payload: bytes, authorized: bool = True
) -> bytes:
    """AlterClientQuotas v0 (classic): entries[entity[], ops[key,
    value float64, remove bool]], validate_only. ``authorized`` is the
    caller's ALTER-on-Cluster verdict (ADVICE r7: quota limits gate
    the data plane, so mutating them is a cluster-level privilege);
    False answers every entry with error 31 and mutates nothing."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    entries = []
    for _ in range(max(r.int32(), 0)):
        entity = []
        for _ in range(max(r.int32(), 0)):
            etype = r.nullable_string() or ""
            ename = r.nullable_string()  # null = the default quota
            entity.append((etype, ename))
        ops = []
        for _ in range(max(r.int32(), 0)):
            key = r.nullable_string() or ""
            value = r.float64()
            remove = r.bool_()
            ops.append((key, value, remove))
        entries.append((entity, ops))
    validate_only = r.bool_()
    results = []
    for entity, ops in entries:
        err, msg = wire.ERR_NONE, None
        bad_type = [t for t, _ in entity if t not in VALID_ENTITY_TYPES]
        bad_key = [k for k, _, _ in ops if k not in VALID_KEYS]
        if not authorized:
            err = ERR_CLUSTER_AUTHORIZATION_FAILED
            msg = "Cluster authorization failed"
        elif bad_type or bad_key or not entity:
            err = ERR_INVALID_REQUEST
            msg = f"unsupported entity/key: {bad_type or bad_key or 'empty entity'}"
        elif not validate_only:
            for etype, ename in entity:
                for key, value, remove in ops:
                    qm.set_quota(etype, ename, key, None if remove else value)
        results.append((entity, err, msg))
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int32(0)  # throttle (quota API itself is never throttled here)
    w.int32(len(results))
    for entity, err, msg in results:
        w.int16(err)
        w.nullable_string(msg)
        w.int32(len(entity))
        for etype, ename in entity:
            w.nullable_string(etype)
            w.nullable_string(ename)
    return w.bytes()


def handle_describe_client_quotas(
    qm: QuotaManager, payload: bytes, authorized: bool = True
) -> bytes:
    """DescribeClientQuotas v0 (classic): components[entity_type,
    match_type int8, match], strict. Returns every configured entity
    matching ALL components. ``authorized`` is the caller's
    DESCRIBE-on-Cluster verdict."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    components = []
    for _ in range(max(r.int32(), 0)):
        etype = r.nullable_string() or ""
        match_type = r.int8()
        match = r.nullable_string()
        components.append((etype, match_type, match))
    r.bool_()  # strict (single-entity-type model: no transitive entities)
    err, msg = wire.ERR_NONE, None
    bad = [t for t, _, _ in components if t not in VALID_ENTITY_TYPES]
    if not authorized:
        err, msg = ERR_CLUSTER_AUTHORIZATION_FAILED, "Cluster authorization failed"
        matched = []
    elif bad:
        err, msg = ERR_INVALID_REQUEST, f"unsupported entity type(s): {bad}"
        matched: list[tuple[str, str | None]] = []
    else:
        matched = []
        for ent in sorted(qm.quotas, key=lambda e: (e[0], e[1] or "")):
            ok = True
            for etype, match_type, match in components:
                if ent[0] != etype:
                    ok = False
                elif match_type == MATCH_EXACT and ent[1] != match:
                    ok = False
                elif match_type == MATCH_DEFAULT and ent[1] is not None:
                    ok = False
                elif match_type not in (MATCH_EXACT, MATCH_DEFAULT, MATCH_ANY):
                    ok = False
            if ok and components:
                matched.append(ent)
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int32(0)  # throttle
    w.int16(err)
    w.nullable_string(msg)
    w.int32(len(matched))
    for ent in matched:
        w.int32(1)  # one entity level per entry in this model
        w.nullable_string(ent[0])
        w.nullable_string(ent[1])
        cfg = qm.quotas.get(ent, {})
        w.int32(len(cfg))
        for key in sorted(cfg):
            w.nullable_string(key)
            w.float64(cfg[key])
    return w.bytes()

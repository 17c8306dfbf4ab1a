"""ACL authorizer + wire APIs: DescribeAcls (29), CreateAcls (30),
DeleteAcls (31), with AclAuthorizer-compatible semantics.

Completes the reference's declared "Encryption & Authentication"
roadmap row (`/root/reference/README.md:51`) beyond SASL/PLAIN
identity: per-resource authorization with the upstream matching
rules —

- resource patterns: LITERAL (exact name, or the ``*`` wildcard
  literal) and PREFIXED (name prefix);
- operation matches when the binding names the operation or ALL;
- principal/host match exactly or via ``*``;
- **DENY overrides ALLOW** at equal specificity — one matching DENY
  binding rejects regardless of how many ALLOWs also match;
- super users bypass every check (the broker-config escape hatch).

Enforcement is injected into the data path: KafkaFrontend passes an
``authorize`` callback into handle_produce / handle_fetch, which
answer TOPIC_AUTHORIZATION_FAILED (29) per topic — the same error
placement a real broker uses, so unauthorized topics fail while
authorized ones in the same request proceed.

Wire versions: v0-v1 (v1 adds resource_pattern_type per KIP-290;
both non-flexible, matching the upstream cutover at v2).
"""

from __future__ import annotations

from dataclasses import dataclass

from kcore_spark.protocol import wire

# resource types (public protocol enums)
RES_ANY, RES_TOPIC, RES_GROUP, RES_CLUSTER, RES_TXN_ID = 1, 2, 3, 4, 5
# pattern types
PAT_ANY, PAT_MATCH, PAT_LITERAL, PAT_PREFIXED = 1, 2, 3, 4
# operations
OP_ANY, OP_ALL, OP_READ, OP_WRITE, OP_CREATE, OP_DELETE, OP_ALTER, OP_DESCRIBE = (
    1, 2, 3, 4, 5, 6, 7, 8,
)
# permission types
PERM_ANY, PERM_DENY, PERM_ALLOW = 1, 2, 3

ERR_TOPIC_AUTHORIZATION_FAILED = 29
ERR_INVALID_REQUEST = 42

_OP_NAMES = {
    "ANY": OP_ANY, "ALL": OP_ALL, "READ": OP_READ, "WRITE": OP_WRITE,
    "CREATE": OP_CREATE, "DELETE": OP_DELETE, "ALTER": OP_ALTER,
    "DESCRIBE": OP_DESCRIBE,
}
_RES_NAMES = {"TOPIC": RES_TOPIC, "GROUP": RES_GROUP, "CLUSTER": RES_CLUSTER}


@dataclass(frozen=True)
class AclBinding:
    resource_type: int
    resource_name: str
    pattern_type: int  # LITERAL or PREFIXED
    principal: str  # "User:alice" or "User:*"
    host: str  # "*" or an address
    operation: int
    permission: int  # ALLOW or DENY


class AclStore:
    def __init__(self, super_users: set[str] | None = None):
        self._bindings: list[AclBinding] = []
        self.super_users = set(super_users or ())

    # ------------------------------------------------------ CRUD

    def create(self, binding: AclBinding) -> None:
        if binding not in self._bindings:
            self._bindings.append(binding)

    def describe(self, **filters) -> list[AclBinding]:
        return [b for b in self._bindings if _filter_matches(b, filters)]

    def delete(self, **filters) -> list[AclBinding]:
        matched = [b for b in self._bindings if _filter_matches(b, filters)]
        self._bindings = [b for b in self._bindings if b not in matched]
        return matched

    # ------------------------------------------------ authorization

    def authorize(
        self, principal: str, operation: str | int, resource_type: str | int,
        resource_name: str, host: str = "*",
    ) -> bool:
        """Deny-over-allow: one matching DENY (of the operation or ALL)
        rejects; otherwise any matching ALLOW grants; no match →
        rejected (default deny, allow.everyone.if.no.acl.found=false).

        Implication table (upstream AclAuthorizer, found missing by the
        r13 ACL model fuzz): an ALLOW of READ, WRITE, DELETE, or ALTER
        implicitly allows DESCRIBE — a consumer granted only READ must
        still see the topic's metadata. DENY does NOT imply: only an
        explicit DESCRIBE (or ALL) deny blocks DESCRIBE."""
        if principal in self.super_users:
            return True
        op = _OP_NAMES[operation] if isinstance(operation, str) else operation
        rt = _RES_NAMES[resource_type] if isinstance(resource_type, str) else resource_type
        allow_ops = (
            (OP_DESCRIBE, OP_READ, OP_WRITE, OP_DELETE, OP_ALTER)
            if op == OP_DESCRIBE
            else (op,)
        )
        allowed = False
        for b in self._bindings:
            if b.resource_type != rt:
                continue
            if not _resource_matches(b, resource_name):
                continue
            if b.principal not in (principal, "User:*"):
                continue
            if b.host not in (host, "*"):
                continue
            if b.permission == PERM_DENY:
                if b.operation in (op, OP_ALL):
                    return False
            elif b.operation in allow_ops or b.operation == OP_ALL:
                allowed = True
        return allowed


def _resource_matches(b: AclBinding, name: str) -> bool:
    if b.pattern_type == PAT_PREFIXED:
        return name.startswith(b.resource_name)
    return b.resource_name in (name, "*")


def _filter_matches(b: AclBinding, f: dict) -> bool:
    rt = f.get("resource_type", RES_ANY)
    if rt not in (RES_ANY, b.resource_type):
        return False
    rn = f.get("resource_name")
    pt = f.get("pattern_type", PAT_ANY)
    if rn is not None:
        if pt == PAT_MATCH:
            # MATCH: filter name is a concrete resource; binding must
            # cover it under its own pattern semantics
            if not _resource_matches(b, rn):
                return False
        elif pt in (PAT_ANY,):
            if b.resource_name != rn:
                return False
        else:  # LITERAL / PREFIXED: exact binding lookup
            if b.resource_name != rn or b.pattern_type != pt:
                return False
    elif pt not in (PAT_ANY, PAT_MATCH) and b.pattern_type != pt:
        return False
    pr = f.get("principal")
    if pr is not None and b.principal != pr:
        return False
    h = f.get("host")
    if h is not None and b.host != h:
        return False
    op = f.get("operation", OP_ANY)
    if op not in (OP_ANY, b.operation):
        return False
    perm = f.get("permission", PERM_ANY)
    if perm not in (PERM_ANY, b.permission):
        return False
    return True


# ------------------------------------------------------ wire handlers


def _read_filter(r: wire.Reader, v: int) -> dict:
    f: dict = {"resource_type": r.int8()}
    f["resource_name"] = r.nullable_string()
    f["pattern_type"] = r.int8() if v >= 1 else PAT_LITERAL
    f["principal"] = r.nullable_string()
    f["host"] = r.nullable_string()
    f["operation"] = r.int8()
    f["permission"] = r.int8()
    # drop unset (null) name/principal/host so describe() treats them as ANY
    return {k: val for k, val in f.items() if val is not None}


def handle_describe_acls(store: AclStore, payload: bytes) -> bytes:
    """DescribeAcls (29, v0-v1): filter → bindings grouped by resource."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    f = _read_filter(r, v)
    matched = store.describe(**f)
    by_res: dict[tuple[int, str, int], list[AclBinding]] = {}
    for b in matched:
        by_res.setdefault((b.resource_type, b.resource_name, b.pattern_type), []).append(b)
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int32(0)  # throttle
    w.int16(wire.ERR_NONE)
    w.nullable_string(None)  # error_message
    w.int32(len(by_res))
    for (rt, rn, pt), accs in sorted(by_res.items()):
        w.int8(rt)
        w.nullable_string(rn)
        if v >= 1:
            w.int8(pt)
        w.int32(len(accs))
        for b in sorted(accs, key=lambda b: (b.principal, b.host, b.operation, b.permission)):
            w.nullable_string(b.principal)
            w.nullable_string(b.host)
            w.int8(b.operation)
            w.int8(b.permission)
    return w.bytes()


def handle_create_acls(store: AclStore, payload: bytes) -> bytes:
    """CreateAcls (30, v0-v1)."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    results = []
    for _ in range(max(r.int32(), 0)):
        rt = r.int8()
        rn = r.nullable_string() or ""
        pt = r.int8() if v >= 1 else PAT_LITERAL
        principal = r.nullable_string() or ""
        host = r.nullable_string() or "*"
        op = r.int8()
        perm = r.int8()
        if pt not in (PAT_LITERAL, PAT_PREFIXED) or perm not in (PERM_ALLOW, PERM_DENY):
            results.append((ERR_INVALID_REQUEST, "invalid pattern/permission"))
            continue
        store.create(AclBinding(rt, rn, pt, principal, host, op, perm))
        results.append((wire.ERR_NONE, None))
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int32(0)  # throttle
    w.int32(len(results))
    for err, msg in results:
        w.int16(err)
        w.nullable_string(msg)
    return w.bytes()


def handle_delete_acls(store: AclStore, payload: bytes) -> bytes:
    """DeleteAcls (31, v0-v1): every filter reports its matches."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    filters = [_read_filter(r, v) for _ in range(max(r.int32(), 0))]
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int32(0)  # throttle
    w.int32(len(filters))
    for f in filters:
        matched = store.delete(**f)
        w.int16(wire.ERR_NONE)
        w.nullable_string(None)
        w.int32(len(matched))
        for b in matched:
            w.int16(wire.ERR_NONE)
            w.nullable_string(None)
            w.int8(b.resource_type)
            w.nullable_string(b.resource_name)
            if v >= 1:
                w.int8(b.pattern_type)
            w.nullable_string(b.principal)
            w.nullable_string(b.host)
            w.int8(b.operation)
            w.int8(b.permission)
    return w.bytes()

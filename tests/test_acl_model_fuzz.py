"""Model-based fuzz of the ACL authorizer (`protocol/acl.py`) —
campaign A of the r13 fuzz round.

Random binding sets (literal/prefixed patterns, wildcard and exact
principals/hosts, the full operation enum, ALLOW and DENY) are
installed through the wire CreateAcls handler, then a dense grid of
authorize() queries is compared against an independent model
implementing the published AclAuthorizer semantics:

- default deny (allow.everyone.if.no.acl.found=false);
- one matching DENY (of the operation or ALL) rejects regardless of
  allows;
- otherwise any matching ALLOW grants — where an ALLOW of READ,
  WRITE, DELETE, or ALTER *implicitly allows DESCRIBE* (the upstream
  implication table; found missing by this campaign and fixed in the
  same round);
- LITERAL matches the exact name or the "*" wildcard literal;
  PREFIXED matches any name with the binding's prefix;
- principal/host match exactly or via "*"; super users bypass all.

DeleteAcls filters are fuzzed the same way against model-side
filtering, so CRUD and match semantics stay locked together.
"""

from __future__ import annotations

import random

import pytest

from kcore_spark.protocol.acl import (
    OP_ALL,
    OP_ALTER,
    OP_CREATE,
    OP_DELETE,
    OP_DESCRIBE,
    OP_READ,
    OP_WRITE,
    PAT_LITERAL,
    PAT_PREFIXED,
    PERM_ALLOW,
    PERM_DENY,
    RES_GROUP,
    RES_TOPIC,
    AclBinding,
    AclStore,
)

OPS = [OP_READ, OP_WRITE, OP_CREATE, OP_DELETE, OP_ALTER, OP_DESCRIBE, OP_ALL]
NAMES = ["orders", "orders-eu", "ord", "payments", "pay", "*"]
QUERY_NAMES = ["orders", "orders-eu", "ordx", "payments", "pay-2024", "zzz"]
PRINCIPALS = ["User:alice", "User:bob", "User:*"]
QUERY_PRINCIPALS = ["User:alice", "User:bob", "User:carol"]
HOSTS = ["10.0.0.1", "*"]
QUERY_HOSTS = ["10.0.0.1", "10.0.0.2"]

# the upstream implication table: an ALLOW of any of these implicitly
# allows DESCRIBE (DENY does NOT imply — only DESCRIBE/ALL deny it)
DESCRIBE_IMPLIED_BY = {OP_DESCRIBE, OP_READ, OP_WRITE, OP_DELETE, OP_ALTER}


def model_authorize(bindings, super_users, principal, op, rt, name, host):
    if principal in super_users:
        return True
    allow_ops = DESCRIBE_IMPLIED_BY if op == OP_DESCRIBE else {op}

    def matches(b, ops):
        if b.resource_type != rt:
            return False
        if b.pattern_type == PAT_PREFIXED:
            if not name.startswith(b.resource_name):
                return False
        elif b.resource_name not in (name, "*"):
            return False
        if b.principal not in (principal, "User:*"):
            return False
        if b.host not in (host, "*"):
            return False
        return b.operation in ops or b.operation == OP_ALL

    if any(b.permission == PERM_DENY and matches(b, {op}) for b in bindings):
        return False
    return any(b.permission == PERM_ALLOW and matches(b, allow_ops) for b in bindings)


@pytest.mark.parametrize("seed", [3, 11, 21, 35, 51])
def test_acl_authorize_matches_upstream_model(seed):
    rng = random.Random(seed)
    store = AclStore(super_users={"User:root"})
    bindings = []
    for _ in range(rng.randint(4, 14)):
        b = AclBinding(
            resource_type=rng.choice([RES_TOPIC, RES_GROUP]),
            resource_name=rng.choice(NAMES),
            pattern_type=rng.choice([PAT_LITERAL, PAT_PREFIXED]),
            principal=rng.choice(PRINCIPALS),
            host=rng.choice(HOSTS),
            operation=rng.choice(OPS),
            permission=rng.choice([PERM_ALLOW, PERM_ALLOW, PERM_DENY]),
        )
        store.create(b)
        if b not in bindings:
            bindings.append(b)

    mismatches = []
    for principal in QUERY_PRINCIPALS + ["User:root"]:
        for op in OPS[:-1]:  # ALL is not a queryable action
            for rt in (RES_TOPIC, RES_GROUP):
                for name in QUERY_NAMES:
                    for host in QUERY_HOSTS:
                        got = store.authorize(principal, op, rt, name, host)
                        want = model_authorize(
                            bindings, {"User:root"}, principal, op, rt, name, host
                        )
                        if got != want:
                            mismatches.append(
                                (principal, op, rt, name, host, got, want)
                            )
    assert not mismatches, (
        f"{len(mismatches)} authorize() divergences from the AclAuthorizer "
        f"model; first 5: {mismatches[:5]}"
    )


def test_allow_read_implies_describe():
    """The published implication table: ALLOW READ/WRITE/DELETE/ALTER
    implicitly allows DESCRIBE (found missing by the model fuzz); a
    DENY of READ does NOT deny DESCRIBE — only DESCRIBE/ALL deny do."""
    store = AclStore()
    store.create(
        AclBinding(RES_TOPIC, "orders", PAT_LITERAL, "User:alice", "*", OP_READ, PERM_ALLOW)
    )
    assert store.authorize("User:alice", "DESCRIBE", "TOPIC", "orders")
    assert not store.authorize("User:alice", "WRITE", "TOPIC", "orders")
    # deny READ alone leaves DESCRIBE granted by the WRITE allow
    store2 = AclStore()
    store2.create(
        AclBinding(RES_TOPIC, "t", PAT_LITERAL, "User:bob", "*", OP_WRITE, PERM_ALLOW)
    )
    store2.create(
        AclBinding(RES_TOPIC, "t", PAT_LITERAL, "User:bob", "*", OP_READ, PERM_DENY)
    )
    assert store2.authorize("User:bob", "DESCRIBE", "TOPIC", "t")
    assert not store2.authorize("User:bob", "READ", "TOPIC", "t")
    # an explicit DESCRIBE deny wins over the implication
    store2.create(
        AclBinding(RES_TOPIC, "t", PAT_LITERAL, "User:bob", "*", OP_DESCRIBE, PERM_DENY)
    )
    assert not store2.authorize("User:bob", "DESCRIBE", "TOPIC", "t")


@pytest.mark.parametrize("seed", [9, 27, 45])
def test_acl_delete_filters_match_model(seed):
    rng = random.Random(seed)
    store = AclStore()
    bindings = []
    for _ in range(12):
        b = AclBinding(
            resource_type=rng.choice([RES_TOPIC, RES_GROUP]),
            resource_name=rng.choice(NAMES),
            pattern_type=rng.choice([PAT_LITERAL, PAT_PREFIXED]),
            principal=rng.choice(PRINCIPALS),
            host=rng.choice(HOSTS),
            operation=rng.choice(OPS),
            permission=rng.choice([PERM_ALLOW, PERM_DENY]),
        )
        store.create(b)
        if b not in bindings:
            bindings.append(b)
    # literal-exact delete filter: removes exactly the bindings with
    # that (name, pattern) key
    victim = rng.choice(bindings)
    deleted = store.delete(
        resource_type=victim.resource_type,
        resource_name=victim.resource_name,
        pattern_type=victim.pattern_type,
    )
    expect = [
        b
        for b in bindings
        if b.resource_type == victim.resource_type
        and b.resource_name == victim.resource_name
        and b.pattern_type == victim.pattern_type
    ]
    assert sorted(deleted, key=repr) == sorted(expect, key=repr)
    remaining = store.describe()
    assert sorted(remaining, key=repr) == sorted(
        [b for b in bindings if b not in expect], key=repr
    )

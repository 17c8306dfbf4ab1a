"""Property-based pins (hypothesis) for the round-6 pure-logic
components: ACL decision invariants and schema-compatibility algebra.
These run entirely driver-side — no Spark session."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.protocol.acl import (
    OP_ALL,
    OP_READ,
    OP_WRITE,
    PAT_LITERAL,
    PAT_PREFIXED,
    PERM_ALLOW,
    PERM_DENY,
    RES_TOPIC,
    AclBinding,
    AclStore,
)
from kcore_spark.sources.schema_registry import check_compatibility
from pyspark.sql import types as T

names = st.sampled_from(["t", "topic-a", "logs-x", "logs-y", "zz"])
principals = st.sampled_from(["User:a", "User:b", "User:*"])
ops = st.sampled_from([OP_ALL, OP_READ, OP_WRITE])
perms = st.sampled_from([PERM_ALLOW, PERM_DENY])
patterns = st.sampled_from([PAT_LITERAL, PAT_PREFIXED])

bindings = st.builds(
    AclBinding,
    st.just(RES_TOPIC),
    names,
    patterns,
    principals,
    st.just("*"),
    ops,
    perms,
)


@given(st.lists(bindings, max_size=12), st.permutations(range(12)))
@settings(max_examples=150, deadline=None)
def test_acl_decision_is_order_independent(bs, perm):
    """The authorize() verdict must not depend on binding insertion
    order (deny-over-allow is a set property, not a scan order)."""
    a, b = AclStore(), AclStore()
    for x in bs:
        a.create(x)
    for i in perm:
        if i < len(bs):
            b.create(bs[i])
    for x in bs:  # remaining order-coverage: re-add in original order
        b.create(x)
    for principal in ("User:a", "User:b"):
        for op in ("READ", "WRITE"):
            for name in ("t", "logs-x", "other"):
                assert a.authorize(principal, op, "TOPIC", name) == b.authorize(
                    principal, op, "TOPIC", name
                )


@given(st.lists(bindings, max_size=12))
@settings(max_examples=150, deadline=None)
def test_acl_deny_dominates(bs):
    """Adding any DENY binding can only shrink the granted set."""
    store = AclStore()
    for x in bs:
        store.create(x)
    before = {
        (p, op, n): store.authorize(p, op, "TOPIC", n)
        for p in ("User:a", "User:b")
        for op in ("READ", "WRITE")
        for n in ("t", "logs-x")
    }
    store.create(
        AclBinding(RES_TOPIC, "*", PAT_LITERAL, "User:*", "*", OP_ALL, PERM_DENY)
    )
    after = {
        k: store.authorize(k[0], k[1], "TOPIC", k[2]) for k in before
    }
    assert all(not v for v in after.values())
    assert all(before[k] or not after[k] for k in before)


_types = st.sampled_from(
    [T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(), T.StringType()]
)
_fields = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), _types, st.booleans()),
    min_size=0,
    max_size=4,
    unique_by=lambda t: t[0],
)


def _schema(fields):
    return T.StructType([T.StructField(n, t, nb) for n, t, nb in fields])


@given(_fields)
@settings(max_examples=200, deadline=None)
def test_schema_compat_reflexive(fields):
    s = _schema(fields)
    for mode in ("BACKWARD", "FORWARD", "FULL", "NONE"):
        assert check_compatibility(s, s, mode)


@given(_fields, _fields)
@settings(max_examples=200, deadline=None)
def test_schema_full_is_symmetric_and_implies_both(old_f, new_f):
    old, new = _schema(old_f), _schema(new_f)
    full = check_compatibility(old, new, "FULL")
    assert full == (
        check_compatibility(old, new, "BACKWARD")
        and check_compatibility(old, new, "FORWARD")
    )
    assert full == check_compatibility(new, old, "FULL")


@given(_fields)
@settings(max_examples=200, deadline=None)
def test_schema_adding_nullable_field_is_backward_safe(fields):
    old = _schema(fields)
    new = T.StructType(
        list(old.fields) + [T.StructField("zz_new", T.StringType(), True)]
    )
    assert check_compatibility(old, new, "BACKWARD")

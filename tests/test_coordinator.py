"""Group-membership coordinator: full join→sync→heartbeat→leave
lifecycle with two members, generation fencing, error paths."""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend


def _join(group, member_id="", corr=51):
    w = wire.Writer()
    w.int16(wire.JOIN_GROUP_KEY).int16(0).int32(corr)
    w.nullable_string("c")
    w.nullable_string(group)
    w.int32(30000)
    w.nullable_string(member_id)
    w.nullable_string("consumer")
    w.int32(1)
    w.nullable_string("range")
    w.nullable_bytes(b"meta")
    return w.bytes()


def _parse_join(resp):
    r = wire.Reader(resp)
    r.int32()
    err = r.int16()
    gen = r.int32()
    proto = r.nullable_string()
    leader = r.nullable_string()
    member = r.nullable_string()
    members = [(r.nullable_string(), r.nullable_bytes()) for _ in range(r.int32())]
    return err, gen, proto, leader, member, members


def _sync(group, gen, member, assignments=None, corr=52):
    w = wire.Writer()
    w.int16(wire.SYNC_GROUP_KEY).int16(0).int32(corr)
    w.nullable_string("c")
    w.nullable_string(group)
    w.int32(gen)
    w.nullable_string(member)
    assignments = assignments or {}
    w.int32(len(assignments))
    for m, a in assignments.items():
        w.nullable_string(m)
        w.nullable_bytes(a)
    return w.bytes()


def _parse_sync(resp):
    r = wire.Reader(resp)
    r.int32()
    return r.int16(), r.nullable_bytes()


def _heartbeat(group, gen, member, corr=53):
    w = wire.Writer()
    w.int16(wire.HEARTBEAT_KEY).int16(0).int32(corr)
    w.nullable_string("c")
    w.nullable_string(group).int32(gen)
    w.nullable_string(member)
    return w.bytes()


def _leave(group, member, corr=54):
    w = wire.Writer()
    w.int16(wire.LEAVE_GROUP_KEY).int16(0).int32(corr)
    w.nullable_string("c")
    w.nullable_string(group)
    w.nullable_string(member)
    return w.bytes()


def _err_only(resp):
    r = wire.Reader(resp)
    r.int32()
    return r.int16()


def test_two_member_lifecycle():
    fe = KafkaFrontend()
    # member 1 joins → leader, sees itself in member list
    err, gen1, proto, leader, m1, members = _parse_join(fe.handle_request(_join("g")))
    assert (err, proto, leader) == (0, "range", m1)
    assert [m for m, _ in members] == [m1]

    # member 2 joins → generation bumps; non-leader gets empty member list
    err, gen2, _, leader2, m2, members2 = _parse_join(fe.handle_request(_join("g")))
    assert err == 0 and gen2 == gen1 + 1 and leader2 == m1
    assert members2 == []

    # old generation heartbeat fenced
    assert _err_only(fe.handle_request(_heartbeat("g", gen1, m1))) == 22
    assert _err_only(fe.handle_request(_heartbeat("g", gen2, m1))) == 0

    # leader re-joins (existing member id) to learn the new membership
    err, gen3, _, _, _, members3 = _parse_join(fe.handle_request(_join("g", member_id=m1)))
    assert err == 0 and gen3 == gen2
    assert [m for m, _ in members3] == [m1, m2]

    # leader distributes assignments; follower fetches
    asg = {m1: b"partitions:0,1", m2: b"partitions:2"}
    err, mine = _parse_sync(fe.handle_request(_sync("g", gen3, m1, asg)))
    assert (err, mine) == (0, b"partitions:0,1")
    err, theirs = _parse_sync(fe.handle_request(_sync("g", gen3, m2)))
    assert (err, theirs) == (0, b"partitions:2")

    # member 2 leaves → generation bumps, assignments invalidated
    assert _err_only(fe.handle_request(_leave("g", m2))) == 0
    assert _err_only(fe.handle_request(_heartbeat("g", gen3, m1))) == 22


def test_error_paths():
    fe = KafkaFrontend()
    assert _err_only(fe.handle_request(_heartbeat("nope", 0, "m"))) == 69
    err, *_ = _parse_join(fe.handle_request(_join("g", member_id="ghost")))
    assert err == 25
    _parse_join(fe.handle_request(_join("g")))
    assert _err_only(fe.handle_request(_leave("g", "ghost"))) == 25
    err, _ = _parse_sync(fe.handle_request(_sync("g", 99, "ghost")))
    assert err == 25

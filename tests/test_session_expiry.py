"""Lazy session expiry: members that stop heartbeating are removed on
the next group access, bumping the generation/epoch — the single-node
stand-in for the broker's heartbeat timer wheel, driven by an
injectable monotonic clock."""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.consumer_group import ConsumerGroupCoordinator
from kcore_spark.protocol.coordinator import (
    ERR_UNKNOWN_MEMBER_ID,
    Coordinator,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


# ------------------------------------------------------ classic protocol


def _join_v0(coord, group="g", member="", session_timeout_ms=10_000, corr=1):
    w = wire.Writer()
    w.int16(wire.JOIN_GROUP_KEY).int16(0).int32(corr)
    w.nullable_string("t")
    w.nullable_string(group)
    w.int32(session_timeout_ms)
    w.nullable_string(member)
    w.nullable_string("consumer")
    w.int32(1)
    w.nullable_string("range")
    w.nullable_bytes(b"")
    r = wire.Reader(coord.handle_join_group(w.bytes()))
    r.int32()
    assert r.int16() == wire.ERR_NONE
    gen = r.int32()
    r.nullable_string()
    r.nullable_string()
    return r.nullable_string(), gen


def _heartbeat_v0(coord, group, generation, member, corr=2):
    w = wire.Writer()
    w.int16(wire.HEARTBEAT_KEY).int16(0).int32(corr)
    w.nullable_string("t")
    w.nullable_string(group)
    w.int32(generation)
    w.nullable_string(member)
    r = wire.Reader(coord.handle_heartbeat(w.bytes()))
    r.int32()
    return r.int16()


def test_classic_member_expires_after_session_timeout():
    clock = FakeClock()
    coord = Coordinator(clock=clock)
    m1, gen1 = _join_v0(coord, member="", session_timeout_ms=10_000)
    # live heartbeats keep the member in
    clock.advance(8)
    assert _heartbeat_v0(coord, "g", gen1, m1) == wire.ERR_NONE
    clock.advance(8)
    assert _heartbeat_v0(coord, "g", gen1, m1) == wire.ERR_NONE
    # silence beyond session.timeout.ms → expired on next access
    clock.advance(11)
    assert _heartbeat_v0(coord, "g", gen1, m1) == ERR_UNKNOWN_MEMBER_ID
    g = coord.groups["g"]
    assert g.members == [] and g.generation == gen1 + 1


def test_classic_expiry_uses_each_members_own_timeout():
    clock = FakeClock()
    coord = Coordinator(clock=clock)
    m_short, _ = _join_v0(coord, member="", session_timeout_ms=5_000)
    m_long, gen = _join_v0(coord, member="", session_timeout_ms=60_000)
    clock.advance(10)  # past short's timeout, within long's
    # long member heartbeats; short member is expired by that access
    assert _heartbeat_v0(coord, "g", gen, m_long) != ERR_UNKNOWN_MEMBER_ID
    assert coord.groups["g"].members == [m_long]


def test_classic_expiry_clears_assignments():
    clock = FakeClock()
    coord = Coordinator(clock=clock)
    m1, gen = _join_v0(coord, member="", session_timeout_ms=5_000)
    coord.groups["g"].assignments = {m1: b"x"}
    clock.advance(6)
    _heartbeat_v0(coord, "g", gen, m1)
    assert coord.groups["g"].assignments == {}


# ------------------------------------------------------ KIP-848 (k68)


def _hb848(coord, group="g", member="", epoch=0, subs=("t",), corr=3):
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_HEARTBEAT_KEY).int16(0).int32(corr)
    w.nullable_string("cli")
    w.empty_tagged_fields()
    w.compact_string(group)
    w.compact_string(member)
    w.int32(epoch)
    w.compact_string(None)
    w.compact_string(None)
    w.int32(30000)
    w.compact_array_len(len(subs))
    for s in subs:
        w.compact_string(s)
    w.compact_string(None)
    w.compact_array_len(-1)
    w.empty_tagged_fields()
    r = wire.Reader(coord.handle_heartbeat(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()
    err = r.int16()
    r.compact_string()
    member_id = r.compact_string()
    member_epoch = r.int32()
    return err, member_id, member_epoch


def test_848_member_expires_and_partitions_rebalance():
    clock = FakeClock()
    coord = ConsumerGroupCoordinator(
        topic_partitions=lambda: {"t": 4}, session_timeout_ms=45_000, clock=clock
    )
    err, m1, e1 = _hb848(coord)
    assert err == wire.ERR_NONE
    err, m2, e2 = _hb848(coord)
    assert err == wire.ERR_NONE
    g = coord.groups["g"]
    assert len(g.members) == 2
    # m2 keeps heartbeating; m1 goes silent past the session timeout
    clock.advance(30)
    _hb848(coord, member=m2, epoch=e2)
    clock.advance(30)  # m1 now 60s silent (> 45s), m2 30s silent
    err, _, epoch = _hb848(coord, member=m2, epoch=coord.groups["g"].members[m2].member_epoch)
    assert err == wire.ERR_NONE
    assert m1 not in g.members
    # survivor reconciles to the bumped epoch and absorbs all partitions
    err, _, epoch = _hb848(coord, member=m2, epoch=g.members[m2].member_epoch)
    assert err == wire.ERR_NONE
    assert g.members[m2].target == {"t": (0, 1, 2, 3)}


def test_848_live_members_never_expire():
    clock = FakeClock()
    coord = ConsumerGroupCoordinator(
        topic_partitions=lambda: {"t": 2}, session_timeout_ms=45_000, clock=clock
    )
    err, m1, e1 = _hb848(coord)
    for _ in range(5):
        clock.advance(40)  # always within the window
        err, _, _ = _hb848(
            coord, member=m1, epoch=coord.groups["g"].members[m1].member_epoch
        )
        assert err == wire.ERR_NONE
    assert m1 in coord.groups["g"].members


# -------------------------------------------- k68 v1: regex subscription


def _hb848_v1(coord, group="g", member="", epoch=0, subs=(), regex=None, corr=9):
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_HEARTBEAT_KEY).int16(1).int32(corr)
    w.nullable_string("cli")
    w.empty_tagged_fields()
    w.compact_string(group)
    w.compact_string(member)
    w.int32(epoch)
    w.compact_string(None)
    w.compact_string(None)
    w.int32(30000)
    w.compact_array_len(len(subs))
    for s in subs:
        w.compact_string(s)
    w.compact_string(regex)  # v1 subscribed_topic_regex
    w.compact_string(None)
    w.compact_array_len(-1)
    w.empty_tagged_fields()
    r = wire.Reader(coord.handle_heartbeat(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()
    err = r.int16()
    msg = r.compact_string()
    member_id = r.compact_string()
    member_epoch = r.int32()
    return err, msg, member_id, member_epoch


def test_848_v1_regex_resolves_against_catalog():
    catalog = {"logs.a": 2, "logs.b": 1, "metrics": 4}
    coord = ConsumerGroupCoordinator(topic_partitions=lambda: catalog)
    err, _, m1, e1 = _hb848_v1(coord, regex="logs\\..*")
    assert err == wire.ERR_NONE
    member = coord.groups["g"].members[m1]
    assert member.subscriptions == ("logs.a", "logs.b")
    # full target covers both matched topics, none of metrics
    assert set(member.target) == {"logs.a", "logs.b"}


def test_848_v1_regex_picks_up_new_topics_lazily():
    catalog = {"logs.a": 2}
    coord = ConsumerGroupCoordinator(topic_partitions=lambda: catalog)
    err, _, m1, e1 = _hb848_v1(coord, regex="logs\\..*")
    assert err == wire.ERR_NONE
    epoch0 = coord.groups["g"].group_epoch
    catalog["logs.new"] = 3  # topic created after subscription
    m = coord.groups["g"].members[m1]
    err, _, _, _ = _hb848_v1(coord, member=m1, epoch=m.member_epoch, subs=None or ())
    assert err == wire.ERR_NONE
    g = coord.groups["g"]
    assert "logs.new" in g.members[m1].subscriptions
    assert g.group_epoch == epoch0 + 1  # effective change bumped the epoch


def test_848_v1_regex_union_with_explicit_names():
    coord = ConsumerGroupCoordinator(
        topic_partitions=lambda: {"a1": 1, "a2": 1, "b": 1}
    )
    err, _, m1, _ = _hb848_v1(coord, subs=("b",), regex="a.*")
    assert err == wire.ERR_NONE
    assert coord.groups["g"].members[m1].subscriptions == ("a1", "a2", "b")


def test_848_v1_invalid_regex_rejected():
    coord = ConsumerGroupCoordinator(topic_partitions=lambda: {"t": 1})
    err, msg, _, _ = _hb848_v1(coord, regex="(unclosed")
    assert err == 42  # INVALID_REQUEST
    assert "regex" in (msg or "")
    assert not coord.groups["g"].members  # nothing joined

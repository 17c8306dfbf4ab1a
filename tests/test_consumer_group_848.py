"""KIP-848 ConsumerGroupHeartbeat (key 68): join, incremental
reconciliation with revocation, epoch fencing, subscription change,
leave, and the error paths."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.consumer_group import (
    ERR_FENCED_MEMBER_EPOCH,
    ERR_UNKNOWN_MEMBER_ID,
    ERR_UNSUPPORTED_ASSIGNOR,
    HEARTBEAT_INTERVAL_MS,
)
from kcore_spark.protocol.server import KafkaFrontend


@pytest.fixture
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("ta", 4)
    f.wire_log.create_topic("tb", 2)
    return f


def _hb_req(
    group="g848",
    member="",
    epoch=0,
    subs=("ta",),
    owned=None,
    assignor=None,
    rack=None,
    instance=None,
    corr=70,
):
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_HEARTBEAT_KEY).int16(0).int32(corr)
    w.nullable_string("cli")
    w.empty_tagged_fields()  # header v2
    w.compact_string(group)
    w.compact_string(member)
    w.int32(epoch)
    w.compact_string(instance)  # instance_id
    w.compact_string(rack)  # rack_id
    w.int32(30000)  # rebalance_timeout_ms
    if subs is None:
        w.compact_array_len(-1)
    else:
        w.compact_array_len(len(subs))
        for s in subs:
            w.compact_string(s)
    w.compact_string(assignor)
    if owned is None:
        w.compact_array_len(-1)
    else:
        w.compact_array_len(len(owned))
        for topic, parts in owned.items():
            w.uuid(wire.topic_uuid(topic))
            w.compact_array_len(len(parts))
            for p in parts:
                w.int32(p)
            w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _parse_hb(resp, catalog=("ta", "tb")):
    r = wire.Reader(resp)
    corr = r.int32()
    r.tagged_fields()
    r.int32()  # throttle
    err = r.int16()
    msg = r.compact_string()
    member = r.compact_string()
    epoch = r.int32()
    interval = r.int32()
    tag = r.int8()
    assignment = None
    if tag == 1:
        by_id = {wire.topic_uuid(t): t for t in catalog}
        assignment = {}
        for _ in range(r.compact_array_len()):
            tid = r.uuid()
            parts = tuple(r.int32() for _ in range(r.compact_array_len()))
            r.tagged_fields()
            assignment[by_id[tid]] = parts
        r.tagged_fields()
    r.tagged_fields()
    return corr, err, msg, member, epoch, interval, assignment


def test_join_gets_id_epoch_and_full_assignment(fe):
    corr, err, _, member, epoch, interval, asg = _parse_hb(
        fe.handle_request(_hb_req())
    )
    assert (corr, err) == (70, wire.ERR_NONE)
    assert member and member.startswith("cg-member-")
    assert epoch == 1 and interval == HEARTBEAT_INTERVAL_MS
    assert asg == {"ta": (0, 1, 2, 3)}  # sole subscriber owns every partition


def test_steady_state_heartbeat_omits_assignment(fe):
    _, _, _, member, epoch, _, _ = _parse_hb(fe.handle_request(_hb_req()))
    _, err, _, _, epoch2, _, asg = _parse_hb(
        fe.handle_request(_hb_req(member=member, epoch=epoch, subs=None))
    )
    assert err == wire.ERR_NONE and epoch2 == epoch
    assert asg is None  # unchanged → null assignment


def test_second_join_triggers_incremental_revocation(fe):
    # m1 joins and owns all 4 partitions of ta
    _, _, _, m1, e1, _, a1 = _parse_hb(fe.handle_request(_hb_req()))
    assert a1 == {"ta": (0, 1, 2, 3)}
    # m2 joins: target splits ta two ways, but m1 still owns everything,
    # so m2 must NOT be handed m1's partitions yet — it gets only what
    # is free (nothing), at the new epoch once nothing pends revocation
    _, _, _, m2, e2, _, a2 = _parse_hb(fe.handle_request(_hb_req(corr=71)))
    assert e2 == 2
    assert a2 is not None and all(
        p in ((0, 2), (1, 3)) for p in a2.values()
    ) or a2 == {}
    # m1 heartbeats at its old epoch, reporting it still owns 0-3:
    # the coordinator answers with the SHRUNK set at the SAME epoch
    _, err, _, _, e1b, _, a1b = _parse_hb(
        fe.handle_request(
            _hb_req(member=m1, epoch=e1, subs=None, owned={"ta": (0, 1, 2, 3)})
        )
    )
    assert err == wire.ERR_NONE
    assert e1b == e1  # not yet advanced — revocation pending
    assert a1b is not None and len(a1b.get("ta", ())) == 2  # reduced
    # m1 confirms the revocation by reporting the reduced ownership →
    # advances to the group epoch with its final target
    _, err, _, _, e1c, _, a1c = _parse_hb(
        fe.handle_request(_hb_req(member=m1, epoch=e1, subs=None, owned=a1b))
    )
    assert err == wire.ERR_NONE and e1c == 2
    assert a1c is not None and len(a1c["ta"]) == 2


def test_fenced_epoch_and_unknown_member(fe):
    _, _, _, member, epoch, _, _ = _parse_hb(fe.handle_request(_hb_req()))
    _, err, *_ = _parse_hb(
        fe.handle_request(_hb_req(member=member, epoch=epoch + 7, subs=None))
    )
    assert err == ERR_FENCED_MEMBER_EPOCH
    _, err2, *_ = _parse_hb(fe.handle_request(_hb_req(member="ghost", epoch=1, subs=None)))
    assert err2 == ERR_UNKNOWN_MEMBER_ID


def test_subscription_change_bumps_group_epoch(fe):
    _, _, _, member, epoch, _, _ = _parse_hb(fe.handle_request(_hb_req()))
    _, err, _, _, epoch2, _, asg = _parse_hb(
        fe.handle_request(_hb_req(member=member, epoch=epoch, subs=("ta", "tb")))
    )
    assert err == wire.ERR_NONE and epoch2 == epoch + 1
    assert asg == {"ta": (0, 1, 2, 3), "tb": (0, 1)}


def test_leave_removes_member_and_frees_partitions(fe):
    _, _, _, m1, e1, _, _ = _parse_hb(fe.handle_request(_hb_req()))
    _, _, _, m2, e2, _, _ = _parse_hb(fe.handle_request(_hb_req(corr=71)))
    _, err, _, _, epoch, _, _ = _parse_hb(
        fe.handle_request(_hb_req(member=m1, epoch=-1, subs=None))
    )
    assert err == wire.ERR_NONE and epoch == -1
    g = fe.consumer_groups.groups["g848"]
    assert m1 not in g.members and m2 in g.members
    # m2 reconciles to the whole topic now that m1's claim is gone
    _, _, _, _, e2b, _, a2 = _parse_hb(
        fe.handle_request(_hb_req(member=m2, epoch=e2, subs=None, owned={}))
    )
    assert a2 == {"ta": (0, 1, 2, 3)}


def test_unsupported_assignor_rejected(fe):
    _, err, msg, *_ = _parse_hb(fe.handle_request(_hb_req(assignor="sticky-v9")))
    assert err == ERR_UNSUPPORTED_ASSIGNOR
    assert msg and "sticky-v9" in msg


def test_advertised_in_api_versions(fe):
    ranges = {k: (lo, hi) for k, lo, hi in wire.SUPPORTED_APIS}
    assert ranges[wire.CONSUMER_GROUP_HEARTBEAT_KEY] == (0, 1)


# -------------------------- no-concurrent-owner across handover (r5)


def _hb(fe, **kw):
    corr, err, msg, member, epoch, interval, asg = _parse_hb(
        fe.handle_request(_hb_req(**kw))
    )
    return {"err": err, "member": member, "epoch": epoch, "assignment": asg}


def _owned_of(fe, group, member):
    return fe.consumer_groups.groups[group].members[member].current


def test_handover_never_grants_partitions_still_confirmed_elsewhere(fe):
    # A joins alone and confirms ownership of all 4 partitions of "ta"
    ra = _hb(fe, subs=("ta",))
    a = ra["member"]
    ra = _hb(fe, member=a, epoch=ra["epoch"], owned={"ta": (0, 1, 2, 3)})
    assert _owned_of(fe, "g848", a) == {"ta": (0, 1, 2, 3)}
    # B joins: its grant must EXCLUDE everything A still confirms
    rb = _hb(fe, subs=("ta",))
    b = rb["member"]
    assert not rb["assignment"], (
        f"B was granted {rb['assignment']} while A still confirms ownership"
    )
    # A's next contact is fenced (B's join bumped the epoch) → it
    # rejoins reporting its shrink to {0,1}; B then receives the rest
    ra = _hb(fe, member=a, epoch=0, subs=("ta",), owned={"ta": (0, 1)})
    assert ra["err"] == 0
    rb = _hb(fe, member=b, epoch=rb["epoch"])
    got_a = _owned_of(fe, "g848", a)
    got_b = _owned_of(fe, "g848", b)
    overlap = {(t, p) for t, ps in got_a.items() for p in ps} & {
        (t, p) for t, ps in got_b.items() for p in ps
    }
    assert overlap == set(), f"concurrent owners of {overlap}"
    # B did receive the freed partitions
    assert got_b.get("ta"), f"B never received freed partitions: {got_b}"


def test_rejoin_with_empty_owned_does_not_livelock(fe):
    ra = _hb(fe, subs=("ta",))
    a = ra["member"]
    _hb(fe, member=a, epoch=ra["epoch"], owned={"ta": (0, 1, 2, 3)})
    _hb(fe, subs=("ta",))  # B joins
    # A crashes and rejoins from scratch, reporting it owns NOTHING
    ra = _hb(fe, member=a, epoch=0, subs=("ta",), owned={})
    assert ra["err"] == 0
    # owned={} means no pending revocation: A must advance past epoch 0
    g = fe.consumer_groups.groups["g848"]
    assert ra["epoch"] == g.group_epoch > 0
    # and a repeated identical rejoin must NOT bump the group epoch
    before = g.group_epoch
    _hb(fe, member=a, epoch=0, subs=("ta",), owned={})
    assert g.group_epoch == before


# -------------------------- server-side assignors + rack echo (r5)


def test_range_assignor_contiguous_chunks(fe):
    """The range assignor hands each member one contiguous chunk per
    topic — co-partitioned topics land the same partition numbers on
    the same member."""
    ra = _hb(fe, subs=("ta", "tb"), assignor="range")
    assert ra["assignment"] == {"ta": (0, 1, 2, 3), "tb": (0, 1)}
    _hb(fe, corr=71, subs=("ta", "tb"), assignor="range")
    g = fe.consumer_groups.groups["g848"]
    assert g.assignor == "range"
    first, second = sorted(g.members)
    assert g.members[first].target == {"ta": (0, 1), "tb": (0,)}
    assert g.members[second].target == {"ta": (2, 3), "tb": (1,)}


def test_uniform_assignor_round_robin_two_members(fe):
    _hb(fe, subs=("ta",))
    _hb(fe, corr=71, subs=("ta",))
    g = fe.consumer_groups.groups["g848"]
    first, second = sorted(g.members)
    assert g.members[first].target == {"ta": (0, 2)}
    assert g.members[second].target == {"ta": (1, 3)}


def test_assignor_switch_retargets_group(fe):
    _hb(fe, subs=("ta", "tb"), assignor="range")
    g = fe.consumer_groups.groups["g848"]
    e_before = g.group_epoch
    # a later join declaring a different assignor switches the group
    _hb(fe, corr=71, subs=("ta", "tb"), assignor="uniform")
    assert g.assignor == "uniform"
    assert g.group_epoch > e_before
    first, second = sorted(g.members)
    # round-robin, not contiguous
    assert g.members[first].target == {"ta": (0, 2), "tb": (0,)}
    assert g.members[second].target == {"ta": (1, 3), "tb": (1,)}


def test_rack_stored_and_echoed_in_describe(fe):
    ra = _hb(fe, subs=("ta",), rack="rack-7")
    member = ra["member"]
    g = fe.consumer_groups.groups["g848"]
    assert g.members[member].rack == "rack-7"

    # describe (k69) echoes the member's rack and the group assignor
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_DESCRIBE_KEY).int16(0).int32(9)
    w.nullable_string("cli")
    w.empty_tagged_fields()
    w.compact_array_len(1)
    w.compact_string("g848")
    w.bool_(False)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()  # throttle
    assert r.compact_array_len() == 1
    assert r.int16() == wire.ERR_NONE
    r.compact_string()  # error_message
    assert r.compact_string() == "g848"
    r.compact_string()  # state
    r.int32(), r.int32()  # epochs
    assert r.compact_string() == "uniform"  # default when none declared
    assert r.compact_array_len() == 1
    assert r.compact_string() == member
    r.compact_string()  # instance_id
    assert r.compact_string() == "rack-7"


def test_static_instance_takeover_reclaims_member(fe):
    """A restarted static instance (same instance_id, empty member_id)
    takes over its old member entry — same member id, same confirmed
    ownership, no ghost double-membership."""
    ra = _hb(fe, subs=("ta",), instance="inst-1")
    a = ra["member"]
    _hb(fe, member=a, epoch=ra["epoch"], owned={"ta": (0, 1, 2, 3)})
    g = fe.consumer_groups.groups["g848"]
    epoch_before = g.group_epoch
    # the process restarts: empty member_id, same instance_id
    rb = _hb(fe, subs=("ta",), instance="inst-1")
    assert rb["member"] == a  # took over the SAME member id
    assert len(g.members) == 1  # no ghost
    assert g.group_epoch == epoch_before  # unchanged subscription: no churn
    # a DIFFERENT instance still gets a fresh member
    rc = _hb(fe, subs=("ta",), instance="inst-2")
    assert rc["member"] != a
    assert len(g.members) == 2


def _describe(fe, version: int, gid: str = "g848") -> wire.Reader:
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_DESCRIBE_KEY).int16(version).int32(9)
    w.nullable_string("cli")
    w.empty_tagged_fields()
    w.compact_array_len(1)
    w.compact_string(gid)
    w.bool_(False)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()  # throttle
    return r


def _read_assignment(r: wire.Reader) -> dict[str, tuple[int, ...]]:
    out = {}
    for _ in range(max(r.compact_array_len(), 0)):
        r.uuid()
        t = r.compact_string()
        out[t] = tuple(r.int32() for _ in range(max(r.compact_array_len(), 0)))
        r.tagged_fields()
    r.tagged_fields()
    return out


def _read_member(r: wire.Reader, version: int) -> dict:
    m = {"id": r.compact_string()}
    m["instance"] = r.compact_string()
    m["rack"] = r.compact_string()
    m["epoch"] = r.int32()
    r.compact_string(), r.compact_string()  # client id/host
    m["subs"] = tuple(
        r.compact_string() for _ in range(max(r.compact_array_len(), 0))
    )
    m["regex"] = r.compact_string()
    m["current"] = _read_assignment(r)
    m["target"] = _read_assignment(r)
    if version >= 1:
        m["member_type"] = r.int8()
    r.tagged_fields()
    return m


def test_describe_v1_member_type(fe):
    """ConsumerGroupDescribe v1 appends MemberType int8 per member
    (1 = KIP-848 consumer member — the only kind this coordinator
    serves). The full member struct must decode EXACTLY through the
    trailing tagged fields in both versions, which pins that v0 does
    NOT carry the byte and v1 does."""
    ra = _hb(fe, subs=("ta",), rack="rack-1")
    for version in (0, 1):
        r = _describe(fe, version)
        assert r.compact_array_len() == 1
        assert r.int16() == wire.ERR_NONE
        r.compact_string()  # error_message
        assert r.compact_string() == "g848"
        assert r.compact_string() in ("Stable", "Reconciling")
        r.int32(), r.int32()  # epochs
        r.compact_string()  # assignor
        assert r.compact_array_len() == 1
        m = _read_member(r, version)
        assert m["id"] == ra["member"]
        assert m["rack"] == "rack-1"
        assert m["subs"] == ("ta",)
        assert ("member_type" in m) == (version == 1)
        if version == 1:
            assert m["member_type"] == 1
        r.int32()  # authorized_operations
        r.tagged_fields()  # group struct
        r.tagged_fields()  # response tail
        assert r.pos == len(r.buf)


def test_describe_v1_missing_group_decodes(fe):
    r = _describe(fe, 1, gid="ghost")
    assert r.compact_array_len() == 1
    assert r.int16() == 69  # GROUP_ID_NOT_FOUND
    r.compact_string()
    assert r.compact_string() == "ghost"
    assert r.compact_string() == "Dead"
    r.int32(), r.int32()
    r.compact_string()
    assert r.compact_array_len() == 0  # no members → no MemberType bytes
    r.int32()
    r.tagged_fields()
    r.tagged_fields()
    assert r.pos == len(r.buf)

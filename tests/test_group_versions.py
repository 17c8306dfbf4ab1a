"""Group-API version widening: JoinGroup v0-v5 (incl. the KIP-394
MEMBER_ID_REQUIRED dance and KIP-345 group_instance_id), SyncGroup
v0-v3, Heartbeat v0-v4 (flexible), LeaveGroup v0-v3 (batched),
FindCoordinator v0-v4 (flexible + KIP-699 batched), OffsetCommit
v2-v8, OffsetFetch v1-v6 — exercised through the real dispatch path."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("t", 2)
    return f


def _hdr(w, key, version, corr):
    w.int16(key).int16(version).int32(corr)
    w.nullable_string("pytest")
    return w


def _join_payload(version, group="g", member="", corr=61):
    w = _hdr(wire.Writer(), wire.JOIN_GROUP_KEY, version, corr)
    w.nullable_string(group)
    w.int32(10000)  # session_timeout
    if version >= 1:
        w.int32(30000)  # rebalance_timeout
    w.nullable_string(member)
    w.nullable_string("consumer")
    w.int32(1)
    w.nullable_string("range")
    w.nullable_bytes(b"")
    return w.bytes()


@pytest.mark.parametrize("version", [0, 1, 2])
def test_join_group_versions(fe, version):
    r = wire.Reader(fe.handle_request(_join_payload(version)))
    assert r.int32() == 61
    if version >= 2:
        assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.int32() == 1  # generation
    assert r.nullable_string() == "range"
    leader = r.nullable_string()
    member = r.nullable_string()
    assert leader == member  # first joiner leads
    assert r.int32() == 1  # leader sees the member list


def _sync_payload(version, group, generation, member, corr=62):
    w = _hdr(wire.Writer(), wire.SYNC_GROUP_KEY, version, corr)
    w.nullable_string(group)
    w.int32(generation)
    w.nullable_string(member)
    w.int32(1)
    w.nullable_string(member)
    w.nullable_bytes(b"assign-blob")
    return w.bytes()


@pytest.mark.parametrize("version", [0, 1])
def test_sync_heartbeat_leave_versions(fe, version):
    r = wire.Reader(fe.handle_request(_join_payload(max(version, 1))))
    r.int32()
    if max(version, 1) >= 2:
        r.int32()
    r.int16()
    gen = r.int32()
    r.nullable_string(), r.nullable_string()
    member = r.nullable_string()

    r = wire.Reader(fe.handle_request(_sync_payload(version, "g", gen, member)))
    assert r.int32() == 62
    if version >= 1:
        assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_bytes() == b"assign-blob"

    w = _hdr(wire.Writer(), wire.HEARTBEAT_KEY, version, 63)
    w.nullable_string("g").int32(gen)
    w.nullable_string(member)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 63
    if version >= 1:
        assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE

    w = _hdr(wire.Writer(), wire.LEAVE_GROUP_KEY, version, 64)
    w.nullable_string("g")
    w.nullable_string(member)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 64
    if version >= 1:
        assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE


@pytest.mark.parametrize("version", [0, 1, 2])
def test_find_coordinator_versions(fe, version):
    w = _hdr(wire.Writer(), wire.FIND_COORDINATOR_KEY, version, 65)
    w.nullable_string("g")
    if version >= 1:
        w.int8(0)  # key_type: group
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 65
    if version >= 1:
        assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    if version >= 1:
        assert r.nullable_string() is None  # error_message
    assert r.int32() == 0 and r.nullable_string() == fe.host and r.int32() == fe.port


def _commit_payload(version, group, topic, partition, offset, corr=66):
    w = _hdr(wire.Writer(), wire.OFFSET_COMMIT_KEY, version, corr)
    w.nullable_string(group)
    w.int32(1)  # generation
    w.nullable_string("m")
    if 2 <= version <= 4:
        w.int64(-1)  # retention_time_ms
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition).int64(offset)
    w.nullable_string(None)
    return w.bytes()


@pytest.mark.parametrize("version", [2, 3, 4, 5])
def test_offset_commit_versions(fe, version):
    r = wire.Reader(fe.handle_request(_commit_payload(version, "g", "t", 1, 42)))
    assert r.int32() == 66
    if version >= 3:
        assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.nullable_string() == "t"
    assert r.int32() == 1
    assert r.int32() == 1 and r.int16() == wire.ERR_NONE
    assert fe.group_store.fetch("g", "t", 1) == 42


@pytest.mark.parametrize("version", [1, 2, 3])
def test_offset_fetch_versions(fe, version):
    fe.handle_request(_commit_payload(2, "g", "t", 0, 7))
    fe.handle_request(_commit_payload(2, "g", "t", 1, 9))
    w = _hdr(wire.Writer(), wire.OFFSET_FETCH_KEY, version, 67)
    w.nullable_string("g")
    if version >= 2:
        w.int32(-1)  # null topics = everything committed
    else:
        w.int32(1)
        w.nullable_string("t")
        w.int32(2)
        w.int32(0).int32(1)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 67
    if version >= 3:
        assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.nullable_string() == "t"
    assert r.int32() == 2
    got = {}
    for _ in range(2):
        p = r.int32()
        off = r.int64()
        r.nullable_string()
        assert r.int16() == wire.ERR_NONE
        got[p] = off
    assert got == {0: 7, 1: 9}
    if version >= 2:
        assert r.int16() == wire.ERR_NONE  # top-level error


def test_api_versions_advertises_group_ranges(fe):
    w = _hdr(wire.Writer(), wire.API_VERSIONS_KEY, 0, 68)
    resp = fe.handle_request(w.bytes())
    _, err, apis, _ = wire.decode_api_versions_response(resp, 0)
    ranges = {k: (lo, hi) for k, lo, hi in apis}
    assert ranges[wire.JOIN_GROUP_KEY] == (0, 9)
    assert ranges[wire.HEARTBEAT_KEY] == (0, 4)
    assert ranges[wire.SYNC_GROUP_KEY] == (0, 5)
    assert ranges[wire.LEAVE_GROUP_KEY] == (0, 5)
    assert ranges[wire.OFFSET_COMMIT_KEY] == (2, 8)
    assert ranges[wire.OFFSET_FETCH_KEY] == (1, 9)
    assert ranges[wire.FIND_COORDINATOR_KEY] == (0, 4)
    assert ranges[wire.LIST_OFFSETS_KEY] == (0, 9)
    assert ranges[wire.DELETE_RECORDS_KEY] == (0, 2)


# ------------------------------------------------ group admin APIs


def test_list_describe_delete_groups(fe):
    # join a group, then admin-inspect it
    r = wire.Reader(fe.handle_request(_join_payload(0, group="adm")))
    r.int32(), r.int16()
    gen = r.int32()
    r.nullable_string(), r.nullable_string()
    member = r.nullable_string()
    fe.handle_request(_sync_payload(0, "adm", gen, member))

    # ListGroups sees it with its protocol type
    w = _hdr(wire.Writer(), wire.LIST_GROUPS_KEY, 0, 71)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 71 and r.int16() == wire.ERR_NONE
    groups = {r.nullable_string(): r.nullable_string() for _ in range(r.int32())}
    assert groups == {"adm": "consumer"}

    # DescribeGroups: Stable state, roster with assignment blob
    w = _hdr(wire.Writer(), wire.DESCRIBE_GROUPS_KEY, 0, 72)
    w.int32(2)
    w.nullable_string("adm")
    w.nullable_string("ghost")
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 72
    assert r.int32() == 2
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() == "adm"
    assert r.nullable_string() == "Stable"
    assert r.nullable_string() == "consumer"
    assert r.nullable_string() == "range"
    assert r.int32() == 1
    assert r.nullable_string() == member
    r.nullable_string(), r.nullable_string()  # client id/host
    r.nullable_bytes()
    assert r.nullable_bytes() == b"assign-blob"
    assert r.int16() == 69  # ghost: GROUP_ID_NOT_FOUND
    assert r.nullable_string() == "ghost"
    assert r.nullable_string() == "Dead"

    # DeleteGroups: refuses non-empty, accepts after leave
    def delete(gid, corr):
        w = _hdr(wire.Writer(), wire.DELETE_GROUPS_KEY, 0, corr)
        w.int32(1)
        w.nullable_string(gid)
        r = wire.Reader(fe.handle_request(w.bytes()))
        assert r.int32() == corr
        r.int32()  # throttle
        assert r.int32() == 1
        return r.nullable_string(), r.int16()

    assert delete("adm", 73) == ("adm", 68)  # NON_EMPTY_GROUP
    w = _hdr(wire.Writer(), wire.LEAVE_GROUP_KEY, 0, 74)
    w.nullable_string("adm")
    w.nullable_string(member)
    fe.handle_request(w.bytes())
    assert delete("adm", 75) == ("adm", wire.ERR_NONE)
    assert delete("adm", 76) == ("adm", 69)  # now gone


# ---------------------------------------- OffsetCommit v6-v8 / Fetch v4-v6


def _commit_payload_v6plus(version, group, topic, partition, offset, corr=70):
    flex = version >= 8
    w = wire.Writer()
    w.int16(wire.OFFSET_COMMIT_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
        w.compact_string(group)
        w.int32(1)
        w.compact_string("m")
        w.compact_string(None)  # group_instance_id
        w.compact_array_len(1)
        w.compact_string(topic)
        w.compact_array_len(1)
        w.int32(partition).int64(offset).int32(-1)  # leader epoch
        w.compact_string(None)  # metadata
        w.empty_tagged_fields()  # partition
        w.empty_tagged_fields()  # topic
        w.empty_tagged_fields()  # body
    else:
        w.nullable_string(group)
        w.int32(1)
        w.nullable_string("m")
        if version >= 7:
            w.nullable_string(None)  # group_instance_id
        w.int32(1)
        w.nullable_string(topic)
        w.int32(1)
        w.int32(partition).int64(offset)
        w.int32(-1)  # committed_leader_epoch (v6+)
        w.nullable_string(None)
    return w.bytes()


@pytest.mark.parametrize("version", [6, 7, 8])
def test_offset_commit_v6_to_v8(fe, version):
    flex = version >= 8
    r = wire.Reader(fe.handle_request(_commit_payload_v6plus(version, "g6", "t", 2, 99)))
    assert r.int32() == 70
    if flex:
        r.tagged_fields()
    assert r.int32() == 0  # throttle
    n = r.compact_array_len() if flex else r.int32()
    assert n == 1
    assert (r.compact_string() if flex else r.nullable_string()) == "t"
    n = r.compact_array_len() if flex else r.int32()
    assert n == 1
    assert r.int32() == 2 and r.int16() == wire.ERR_NONE
    assert fe.group_store.fetch("g6", "t", 2) == 99


@pytest.mark.parametrize("version", [4, 5, 6])
def test_offset_fetch_v4_to_v6(fe, version):
    flex = version >= 6
    fe.handle_request(_commit_payload_v6plus(6, "g7", "t", 0, 11))
    w = wire.Writer()
    w.int16(wire.OFFSET_FETCH_KEY).int16(version).int32(71)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
        w.compact_string("g7")
        w.compact_array_len(1)
        w.compact_string("t")
        w.compact_array_len(1)
        w.int32(0)
        w.empty_tagged_fields()
        w.empty_tagged_fields()
    else:
        w.nullable_string("g7")
        w.int32(1)
        w.nullable_string("t")
        w.int32(1)
        w.int32(0)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 71
    if flex:
        r.tagged_fields()
    assert r.int32() == 0  # throttle (v3+)
    n = r.compact_array_len() if flex else r.int32()
    assert n == 1
    assert (r.compact_string() if flex else r.nullable_string()) == "t"
    n = r.compact_array_len() if flex else r.int32()
    assert n == 1
    assert r.int32() == 0
    assert r.int64() == 11
    if version >= 5:
        assert r.int32() == -1  # committed_leader_epoch
    assert (r.compact_string() if flex else r.nullable_string()) is None
    assert r.int16() == wire.ERR_NONE
    if flex:
        r.tagged_fields()
        r.tagged_fields()
    assert r.int16() == wire.ERR_NONE  # top-level


# ---------------------------------------- JoinGroup v4/v5, KIP-394/345


def _join_v45_payload(version, group="g45", member="", corr=80):
    w = _hdr(wire.Writer(), wire.JOIN_GROUP_KEY, version, corr)
    w.nullable_string(group)
    w.int32(10000)  # session_timeout
    w.int32(30000)  # rebalance_timeout (v1+)
    w.nullable_string(member)
    if version >= 5:
        w.nullable_string(None)  # group_instance_id
    w.nullable_string("consumer")
    w.int32(1)
    w.nullable_string("range").nullable_bytes(b"\x00\x01")
    return w.bytes()


@pytest.mark.parametrize("version", [4, 5])
def test_join_group_member_id_required_dance(fe, version):
    # step 1: empty member_id → MEMBER_ID_REQUIRED with an assigned id
    r = wire.Reader(fe.handle_request(_join_v45_payload(version)))
    assert r.int32() == 80
    r.int32()  # throttle
    assert r.int16() == 79  # MEMBER_ID_REQUIRED
    r.int32()  # generation (-1)
    r.nullable_string()
    r.nullable_string()
    assigned = r.nullable_string()
    assert assigned and assigned.startswith("member-")
    # not yet a member
    assert assigned not in fe.coordinator.groups["g45"].members

    # step 2: rejoin WITH the id → joined as leader
    r = wire.Reader(fe.handle_request(_join_v45_payload(version, member=assigned, corr=81)))
    assert r.int32() == 81
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    gen = r.int32()
    assert gen >= 1
    assert r.nullable_string() == "range"
    assert r.nullable_string() == assigned  # leader
    assert r.nullable_string() == assigned  # member
    n = r.int32()
    assert n == 1
    assert r.nullable_string() == assigned
    if version >= 5:
        assert r.nullable_string() is None  # group_instance_id
    assert r.nullable_bytes() == b"\x00\x01"


# ---------------------------------------- JoinGroup v6-v9 / SyncGroup v4-v5
# (flexible encodings; JoinGroup v7+ echoes ProtocolType, v8 adds the
# KIP-800 reason, v9 adds SkipAssignment; SyncGroup v5 echoes the
# group's protocol type/name)


def _flex_hdr(w, key, version, corr):
    w.int16(key).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.empty_tagged_fields()  # header v2
    return w


def _join_flex_payload(version, group="gf", member="", corr=64):
    w = _flex_hdr(wire.Writer(), wire.JOIN_GROUP_KEY, version, corr)
    w.compact_string(group)
    w.int32(10000)
    w.int32(30000)
    w.compact_string(member)
    w.compact_string(None)  # group_instance_id (v5+)
    w.compact_string("consumer")
    w.compact_array_len(1)
    w.compact_string("range").compact_bytes(b"\x00\x02")
    w.empty_tagged_fields()  # protocol entry
    if version >= 8:
        w.compact_string("rebalance reason")  # KIP-800
    w.empty_tagged_fields()
    return w.bytes()


def _parse_join_flex(resp, version):
    r = wire.Reader(resp)
    corr = r.int32()
    r.tagged_fields()  # response header v1
    r.int32()  # throttle
    err = r.int16()
    gen = r.int32()
    ptype = r.compact_string() if version >= 7 else None
    pname = r.compact_string()
    leader = r.compact_string()
    skip = r.int8() if version >= 9 else 0
    member = r.compact_string()
    members = []
    for _ in range(max(r.compact_array_len(), 0)):
        mid = r.compact_string()
        r.compact_string()  # instance id
        meta = r.compact_bytes()
        r.tagged_fields()
        members.append((mid, meta))
    r.tagged_fields()
    return corr, err, gen, ptype, pname, leader, skip, member, members


@pytest.mark.parametrize("version", [6, 7, 8, 9])
def test_join_group_flexible_versions(fe, version):
    # step 1: KIP-394 dance still applies at v6+
    corr, err, gen, ptype, pname, leader, skip, assigned, members = _parse_join_flex(
        fe.handle_request(_join_flex_payload(version, group=f"gf{version}")), version
    )
    assert corr == 64 and err == 79 and gen == -1  # MEMBER_ID_REQUIRED
    assert assigned and assigned.startswith("member-")
    # step 2: rejoin with the id
    corr, err, gen, ptype, pname, leader, skip, member, members = _parse_join_flex(
        fe.handle_request(
            _join_flex_payload(version, group=f"gf{version}", member=assigned, corr=65)
        ),
        version,
    )
    assert (corr, err) == (65, wire.ERR_NONE)
    assert gen >= 1 and pname == "range" and leader == member == assigned
    if version >= 7:
        assert ptype == "consumer"
    assert skip == 0
    assert members == [(assigned, b"\x00\x02")]


def _sync_flex_payload(version, group, generation, member, assignment, corr=66):
    w = _flex_hdr(wire.Writer(), wire.SYNC_GROUP_KEY, version, corr)
    w.compact_string(group)
    w.int32(generation)
    w.compact_string(member)
    w.compact_string(None)  # group_instance_id
    if version >= 5:
        w.compact_string("consumer").compact_string("range")
    w.compact_array_len(1)
    w.compact_string(member).compact_bytes(assignment)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


@pytest.mark.parametrize("version", [4, 5])
def test_sync_group_flexible_versions(fe, version):
    g = f"gs{version}"
    _, _, _, _, _, _, _, assigned, _ = _parse_join_flex(
        fe.handle_request(_join_flex_payload(6, group=g)), 6
    )
    _, err, gen, *_ = _parse_join_flex(
        fe.handle_request(_join_flex_payload(6, group=g, member=assigned, corr=65)), 6
    )
    assert err == wire.ERR_NONE
    r = wire.Reader(
        fe.handle_request(_sync_flex_payload(version, g, gen, assigned, b"parts:0,1"))
    )
    assert r.int32() == 66
    r.tagged_fields()
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE
    if version >= 5:
        assert r.compact_string() == "consumer"
        assert r.compact_string() == "range"
    assert r.compact_bytes() == b"parts:0,1"


def test_pending_member_ids_are_capped(fe):
    """A client that retries forever with an EMPTY member_id must not
    grow the pending-id set unboundedly (each empty-id join allocates a
    fresh id); the FIFO cap expires the oldest un-rejoined ids."""
    from kcore_spark.protocol.coordinator import MAX_PENDING_MEMBERS

    for i in range(MAX_PENDING_MEMBERS + 50):
        fe.handle_request(_join_v45_payload(4, group="gcap", corr=100 + i))
    g = fe.coordinator.groups["gcap"]
    assert len(g.pending) == MAX_PENDING_MEMBERS
    # the newest handed-out id is still honored...
    newest = next(reversed(g.pending))
    r = wire.Reader(fe.handle_request(_join_v45_payload(4, group="gcap", member=newest)))
    r.int32(); r.int32()
    assert r.int16() == wire.ERR_NONE
    # ...while the oldest (expired) id is fenced as unknown
    assert "member-0" not in g.pending
    r = wire.Reader(fe.handle_request(_join_v45_payload(4, group="gcap", member="member-0")))
    r.int32(); r.int32()
    assert r.int16() == 25  # UNKNOWN_MEMBER_ID


def test_leave_group_v3_batched(fe):
    # join two members the v2 way
    def join(corr):
        r = wire.Reader(fe.handle_request(_join_payload(2, group="gl3", corr=corr)))
        r.int32(); r.int32(); r.int16(); r.int32()
        r.nullable_string(); r.nullable_string()
        return r.nullable_string()

    m1, m2 = join(90), join(91)
    w = _hdr(wire.Writer(), wire.LEAVE_GROUP_KEY, 3, 92)
    w.nullable_string("gl3")
    w.int32(2)
    w.nullable_string(m1).nullable_string(None)
    w.nullable_string("ghost").nullable_string(None)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 92
    r.int32()  # throttle
    assert r.int16() == wire.ERR_NONE  # top-level
    assert r.int32() == 2
    got = {}
    for _ in range(2):
        m = r.nullable_string()
        r.nullable_string()
        got[m] = r.int16()
    assert got[m1] == wire.ERR_NONE
    assert got["ghost"] == 25  # UNKNOWN_MEMBER_ID
    assert fe.coordinator.groups["gl3"].members == [m2]


def test_heartbeat_v4_flexible(fe):
    member = None
    r = wire.Reader(fe.handle_request(_join_payload(2, group="gh4", corr=93)))
    r.int32(); r.int32(); r.int16()
    gen = r.int32()
    r.nullable_string(); r.nullable_string()
    member = r.nullable_string()

    w = wire.Writer()
    w.int16(wire.HEARTBEAT_KEY).int16(4).int32(94)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    w.compact_string("gh4")
    w.int32(gen)
    w.compact_string(member)
    w.compact_string(None)  # group_instance_id
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 94
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE


def test_find_coordinator_v3_flexible_and_v4_batched(fe):
    w = wire.Writer()
    w.int16(wire.FIND_COORDINATOR_KEY).int16(3).int32(95)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    w.compact_string("g")
    w.int8(0)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 95
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None  # error_message
    assert r.int32() == 0  # node
    assert r.compact_string() == fe.host

    w = wire.Writer()
    w.int16(wire.FIND_COORDINATOR_KEY).int16(4).int32(96)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    w.int8(0)
    w.compact_array_len(2)
    w.compact_string("g1")
    w.compact_string("g2")
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 96
    r.tagged_fields()
    r.int32()  # throttle
    assert r.compact_array_len() == 2
    keys = []
    for _ in range(2):
        keys.append(r.compact_string())
        assert r.int32() == 0  # node
        assert r.compact_string() == fe.host
        r.int32()  # port
        assert r.int16() == wire.ERR_NONE
        r.compact_string()  # error_message
        r.tagged_fields()
    assert keys == ["g1", "g2"]

"""Round-5 protocol version lifts, exercised through the real dispatch
path: CreateTopics v0-v7 (flexible 5+, KIP-516 topic ids at v7),
DeleteTopics v0-v6 (flexible 4+, delete-by-uuid at v6), LeaveGroup
v4-v5 (flexible + KIP-800 reason), ListGroups v1-v5 (KIP-518 states
filter), DescribeGroups v1-v5, OffsetFetch v7-v9 (KIP-447 / KIP-709
multi-group), and ConsumerGroupDescribe k69 v0 (KIP-848)."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("t", 2)
    return f


def _hdr(w, key, version, corr=77, flex=None):
    flex = wire.is_flexible_request(key, version) if flex is None else flex
    w.int16(key).int16(version).int32(corr)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
    return w


# ------------------------------------------------------ CreateTopics


def _create_topics_req(version, name="newt", parts=3, configs=(), validate=False):
    flex = version >= 5
    w = _hdr(wire.Writer(), wire.CREATE_TOPICS_KEY, version)
    w.compact_array_len(1) if flex else w.int32(1)
    w.compact_string(name) if flex else w.nullable_string(name)
    w.int32(parts)
    w.int16(1)  # replication_factor
    w.compact_array_len(0) if flex else w.int32(0)  # assignments
    w.compact_array_len(len(configs)) if flex else w.int32(len(configs))
    for ck, cv in configs:
        if flex:
            w.compact_string(ck).compact_string(cv).empty_tagged_fields()
        else:
            w.nullable_string(ck).nullable_string(cv)
    if flex:
        w.empty_tagged_fields()  # topic struct
    w.int32(5000)  # timeout_ms
    if version >= 1:
        w.bool_(validate)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


@pytest.mark.parametrize("version", [0, 1, 2, 3, 4])
def test_create_topics_rigid_versions(fe, version):
    r = wire.Reader(fe.handle_request(_create_topics_req(version)))
    assert r.int32() == 77
    if version >= 2:
        assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.nullable_string() == "newt"
    assert r.int16() == wire.ERR_NONE
    if version >= 1:
        assert r.nullable_string() is None  # error_message
    assert fe.wire_log.topics["newt"] == 3


@pytest.mark.parametrize("version", [5, 6, 7])
def test_create_topics_flexible_versions(fe, version):
    req = _create_topics_req(version, configs=[("retention.ms", "1000")])
    r = wire.Reader(fe.handle_request(req))
    assert r.int32() == 77
    r.tagged_fields()  # response header v1
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "newt"
    if version >= 7:
        assert r.uuid() == wire.topic_uuid("newt")
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None  # error_message
    assert r.int32() == 3  # num_partitions echo
    assert r.int16() == 1  # replication_factor
    assert r.compact_array_len() == 1  # configs echo
    assert r.compact_string() == "retention.ms"
    assert r.compact_string() == "1000"
    assert fe.wire_log.topics["newt"] == 3


def test_create_topics_validate_only_does_not_create(fe):
    r = wire.Reader(fe.handle_request(_create_topics_req(5, validate=True)))
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.compact_array_len() == 1
    assert r.compact_string() == "newt"
    assert r.int16() == wire.ERR_NONE
    assert "newt" not in fe.wire_log.topics


# ------------------------------------------------------ DeleteTopics


def _delete_topics_req(version, name="t", by_id=False):
    flex = version >= 4
    w = _hdr(wire.Writer(), wire.DELETE_TOPICS_KEY, version)
    if version >= 6:
        w.compact_array_len(1)
        w.compact_string(None if by_id else name)
        w.uuid(wire.topic_uuid(name))
        w.empty_tagged_fields()
    else:
        w.compact_array_len(1) if flex else w.int32(1)
        w.compact_string(name) if flex else w.nullable_string(name)
    w.int32(5000)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


@pytest.mark.parametrize("version", [0, 1, 2, 3, 4, 5])
def test_delete_topics_versions(fe, version):
    flex = version >= 4
    r = wire.Reader(fe.handle_request(_delete_topics_req(version)))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    if version >= 1:
        assert r.int32() == 0
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert (r.compact_string() if flex else r.nullable_string()) == "t"
    assert r.int16() == wire.ERR_NONE
    if version >= 5:
        assert r.compact_string() is None  # error_message
    assert "t" not in fe.wire_log.topics


def test_delete_topics_v6_by_uuid_only(fe):
    r = wire.Reader(fe.handle_request(_delete_topics_req(6, by_id=True)))
    assert r.int32() == 77
    r.tagged_fields()
    assert r.int32() == 0
    assert r.compact_array_len() == 1
    assert r.compact_string() == "t"  # resolved name echoed back
    assert r.uuid() == wire.topic_uuid("t")
    assert r.int16() == wire.ERR_NONE
    assert "t" not in fe.wire_log.topics


# ------------------------------------------------------ classic group dance


def _join(fe, group="g"):
    """Join + sync one member so group admin APIs have state to read.
    JoinGroup v5 requires the KIP-394 two-step (first empty-id join →
    MEMBER_ID_REQUIRED + assigned id → rejoin). Returns
    (member_id, generation)."""

    def join_once(member_id):
        w = _hdr(wire.Writer(), wire.JOIN_GROUP_KEY, 5, corr=1, flex=False)
        w.nullable_string(group)
        w.int32(10000)
        w.int32(30000)
        w.nullable_string(member_id)
        w.nullable_string(None)  # group_instance_id (v5)
        w.nullable_string("consumer")
        w.int32(1)
        w.nullable_string("range")
        w.nullable_bytes(b"meta")
        r = wire.Reader(fe.handle_request(w.bytes()))
        r.int32()
        r.int32()  # throttle (v2+)
        return r.int16(), r

    err, r = join_once("")
    assert err == 79  # MEMBER_ID_REQUIRED (KIP-394)
    r.int32()
    r.nullable_string()
    r.nullable_string()
    assigned = r.nullable_string()
    err, r = join_once(assigned)
    assert err == wire.ERR_NONE
    gen = r.int32()
    r.nullable_string()
    r.nullable_string()
    member = r.nullable_string()
    w = _hdr(wire.Writer(), wire.SYNC_GROUP_KEY, 3, corr=2, flex=False)
    w.nullable_string(group)
    w.int32(gen)
    w.nullable_string(member)
    w.nullable_string(None)
    w.int32(1)
    w.nullable_string(member)
    w.nullable_bytes(b"assign")
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.int32()
    assert r.int16() == wire.ERR_NONE
    return member, gen


# ------------------------------------------------------ LeaveGroup v4-v5


@pytest.mark.parametrize("version", [4, 5])
def test_leave_group_flexible(fe, version):
    member, _ = _join(fe)
    w = _hdr(wire.Writer(), wire.LEAVE_GROUP_KEY, version)
    w.compact_string("g")
    w.compact_array_len(1)
    w.compact_string(member)
    w.compact_string(None)  # group_instance_id
    if version >= 5:
        w.compact_string("shutting down")  # reason (KIP-800)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.int16() == wire.ERR_NONE
    assert r.compact_array_len() == 1
    assert r.compact_string() == member
    assert r.compact_string() is None
    assert r.int16() == wire.ERR_NONE


# ------------------------------------------------------ ListGroups v1-v5


@pytest.mark.parametrize("version", [1, 2])
def test_list_groups_rigid(fe, version):
    _join(fe)
    r = wire.Reader(fe.handle_request(_hdr(wire.Writer(), wire.LIST_GROUPS_KEY, version).bytes()))
    assert r.int32() == 77
    assert r.int32() == 0  # throttle (v1+)
    assert r.int16() == wire.ERR_NONE
    assert r.int32() == 1
    assert r.nullable_string() == "g"
    assert r.nullable_string() == "consumer"


@pytest.mark.parametrize("version,states,expect", [
    (3, None, 1),
    (4, [], 1),
    (4, ["Stable"], 1),
    (4, ["PreparingRebalance"], 0),
    (5, ["Stable"], 1),
])
def test_list_groups_flexible_and_filters(fe, version, states, expect):
    _join(fe)
    w = _hdr(wire.Writer(), wire.LIST_GROUPS_KEY, version)
    if version >= 4:
        w.compact_array_len(len(states))
        for s in states:
            w.compact_string(s)
    if version >= 5:
        w.compact_array_len(0)  # types_filter
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    r.tagged_fields()
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE
    assert r.compact_array_len() == expect
    if expect:
        assert r.compact_string() == "g"
        assert r.compact_string() == "consumer"
        if version >= 4:
            assert r.compact_string() == "Stable"
        if version >= 5:
            assert r.compact_string() == "classic"


# ------------------------------------------------------ DescribeGroups


@pytest.mark.parametrize("version", [1, 3, 4])
def test_describe_groups_rigid_versions(fe, version):
    member, _ = _join(fe)
    w = _hdr(wire.Writer(), wire.DESCRIBE_GROUPS_KEY, version)
    w.int32(1)
    w.nullable_string("g")
    if version >= 3:
        w.bool_(True)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    assert r.int32() == 0  # throttle
    assert r.int32() == 1
    assert r.int16() == wire.ERR_NONE
    assert r.nullable_string() == "g"
    assert r.nullable_string() == "Stable"
    assert r.nullable_string() == "consumer"
    assert r.nullable_string() == "range"
    assert r.int32() == 1  # members
    assert r.nullable_string() == member
    if version >= 4:
        assert r.nullable_string() is None  # group_instance_id
    r.nullable_string()  # client_id
    r.nullable_string()  # client_host
    assert r.nullable_bytes() == b"meta"
    assert r.nullable_bytes() == b"assign"
    if version >= 3:
        assert r.int32() == 0  # authorized_operations (requested)


def test_describe_groups_v5_flexible(fe):
    member, _ = _join(fe)
    w = _hdr(wire.Writer(), wire.DESCRIBE_GROUPS_KEY, 5)
    w.compact_array_len(1)
    w.compact_string("g")
    w.bool_(False)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    r.tagged_fields()
    assert r.int32() == 0
    assert r.compact_array_len() == 1
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() == "g"
    assert r.compact_string() == "Stable"
    assert r.compact_string() == "consumer"
    assert r.compact_string() == "range"
    assert r.compact_array_len() == 1
    assert r.compact_string() == member
    assert r.compact_string() is None  # group_instance_id
    r.compact_string(), r.compact_string()
    assert r.compact_bytes() == b"meta"
    assert r.compact_bytes() == b"assign"
    r.tagged_fields()  # member struct
    assert r.int32() == -2147483648  # authz not requested


def test_describe_groups_unknown_group_dead_state(fe):
    w = _hdr(wire.Writer(), wire.DESCRIBE_GROUPS_KEY, 5)
    w.compact_array_len(1)
    w.compact_string("nope")
    w.bool_(False)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.compact_array_len() == 1
    assert r.int16() == 69  # GROUP_ID_NOT_FOUND
    assert r.compact_string() == "nope"
    assert r.compact_string() == "Dead"


# ------------------------------------------------------ OffsetFetch v7-v9


def _commit(fe, group="og", topic="t", part=0, offset=42):
    w = _hdr(wire.Writer(), wire.OFFSET_COMMIT_KEY, 2, flex=False)
    w.nullable_string(group)
    w.int32(-1)  # generation
    w.nullable_string("")  # member
    w.int64(-1)  # retention_time
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(part)
    w.int64(offset)
    w.nullable_string(None)
    fe.handle_request(w.bytes())


def test_offset_fetch_v7_require_stable(fe):
    _commit(fe)
    w = _hdr(wire.Writer(), wire.OFFSET_FETCH_KEY, 7)
    w.compact_string("og")
    w.compact_array_len(1)
    w.compact_string("t")
    w.compact_array_len(1)
    w.int32(0)
    w.empty_tagged_fields()
    w.bool_(True)  # require_stable
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    r.tagged_fields()
    assert r.int32() == 0
    assert r.compact_array_len() == 1
    assert r.compact_string() == "t"
    assert r.compact_array_len() == 1
    assert r.int32() == 0
    assert r.int64() == 42
    assert r.int32() == -1  # leader_epoch
    assert r.compact_string() is None
    assert r.int16() == wire.ERR_NONE


@pytest.mark.parametrize("version", [8, 9])
def test_offset_fetch_multi_group(fe, version):
    _commit(fe, group="g1", offset=7)
    _commit(fe, group="g2", offset=9)
    w = _hdr(wire.Writer(), wire.OFFSET_FETCH_KEY, version)
    w.compact_array_len(2)
    for gid in ("g1", "g2"):
        w.compact_string(gid)
        if version >= 9:
            w.compact_string(None)  # member_id
            w.int32(-1)  # member_epoch
        w.compact_array_len(-1)  # null topics → all committed
        w.empty_tagged_fields()
    w.bool_(False)  # require_stable
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    r.tagged_fields()
    assert r.int32() == 0
    assert r.compact_array_len() == 2
    for gid, want in (("g1", 7), ("g2", 9)):
        assert r.compact_string() == gid
        assert r.compact_array_len() == 1
        assert r.compact_string() == "t"
        assert r.compact_array_len() == 1
        assert r.int32() == 0
        assert r.int64() == want
        assert r.int32() == -1
        assert r.compact_string() is None
        assert r.int16() == wire.ERR_NONE
        r.tagged_fields()  # partition
        r.tagged_fields()  # topic
        assert r.int16() == wire.ERR_NONE  # per-group error
        r.tagged_fields()  # group


# ------------------------------------------ ConsumerGroupDescribe k69


def _hb848(fe, group="g848", member="", epoch=0, subs=("t",)):
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_HEARTBEAT_KEY).int16(0).int32(5)
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
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.int16() == wire.ERR_NONE
    r.compact_string()
    member_id = r.compact_string()
    member_epoch = r.int32()
    return member_id, member_epoch


def _describe848(fe, groups, include_authz=False):
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_DESCRIBE_KEY).int16(0).int32(6)
    w.nullable_string("cli")
    w.empty_tagged_fields()
    w.compact_array_len(len(groups))
    for g in groups:
        w.compact_string(g)
    w.bool_(include_authz)
    w.empty_tagged_fields()
    return wire.Reader(fe.handle_request(w.bytes()))


def test_consumer_group_describe_stable_member(fe):
    member, epoch = _hb848(fe)
    r = _describe848(fe, ["g848"], include_authz=True)
    assert r.int32() == 6
    r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert r.compact_array_len() == 1
    assert r.int16() == wire.ERR_NONE
    assert r.compact_string() is None  # error_message
    assert r.compact_string() == "g848"
    assert r.compact_string() == "Stable"
    assert r.int32() == epoch  # group_epoch
    assert r.int32() == epoch  # assignment_epoch
    assert r.compact_string() == "uniform"
    assert r.compact_array_len() == 1
    assert r.compact_string() == member
    assert r.compact_string() is None  # instance_id
    assert r.compact_string() is None  # rack_id
    assert r.int32() == epoch  # member_epoch
    r.compact_string(), r.compact_string()  # client id/host
    assert r.compact_array_len() == 1
    assert r.compact_string() == "t"
    assert r.compact_string() is None  # regex
    # confirmed assignment: both partitions of "t" (sole member)
    assert r.compact_array_len() == 1
    assert r.uuid() == wire.topic_uuid("t")
    assert r.compact_string() == "t"
    assert [r.int32() for _ in range(r.compact_array_len())] == [0, 1]
    r.tagged_fields()
    r.tagged_fields()  # assignment struct
    # target assignment mirrors it
    assert r.compact_array_len() == 1
    assert r.uuid() == wire.topic_uuid("t")
    assert r.compact_string() == "t"
    assert [r.int32() for _ in range(r.compact_array_len())] == [0, 1]
    r.tagged_fields()
    r.tagged_fields()
    r.tagged_fields()  # member struct
    assert r.int32() == 0  # authorized_operations requested


def test_consumer_group_describe_unknown_group(fe):
    r = _describe848(fe, ["missing"])
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.compact_array_len() == 1
    assert r.int16() == 69  # GROUP_ID_NOT_FOUND
    assert r.compact_string() is not None  # error_message
    assert r.compact_string() == "missing"
    assert r.compact_string() == "Dead"


def test_apiversions_advertises_lifted_ranges(fe):
    advertised = {k: (lo, hi) for k, lo, hi in wire.SUPPORTED_APIS}
    assert advertised[wire.CREATE_TOPICS_KEY] == (0, 7)
    assert advertised[wire.DELETE_TOPICS_KEY] == (0, 6)
    assert advertised[wire.LEAVE_GROUP_KEY] == (0, 5)
    assert advertised[wire.LIST_GROUPS_KEY] == (0, 5)
    assert advertised[wire.DESCRIBE_GROUPS_KEY] == (0, 5)
    assert advertised[wire.OFFSET_FETCH_KEY] == (1, 9)
    assert advertised[wire.CONSUMER_GROUP_DESCRIBE_KEY] == (0, 1)


# ------------------------------------ IncrementalAlterConfigs (k44)


def _inc_alter(fe, version, entries, topic="t", validate=False):
    flex = version >= 1
    w = _hdr(wire.Writer(), wire.INCREMENTAL_ALTER_CONFIGS_KEY, version)
    w.compact_array_len(1) if flex else w.int32(1)
    w.int8(2)  # TOPIC
    w.compact_string(topic) if flex else w.nullable_string(topic)
    w.compact_array_len(len(entries)) if flex else w.int32(len(entries))
    for k, op, val in entries:
        w.compact_string(k) if flex else w.nullable_string(k)
        w.int8(op)
        w.compact_string(val) if flex else w.nullable_string(val)
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    w.bool_(validate)
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    assert r.int32() == 0  # throttle
    assert (r.compact_array_len() if flex else r.int32()) == 1
    err = r.int16()
    msg = r.compact_string() if flex else r.nullable_string()
    return err, msg


@pytest.mark.parametrize("version", [0, 1])
def test_incremental_alter_set_and_delete(fe, version):
    err, _ = _inc_alter(fe, version, [("retention.ms", 0, "1000")])
    assert err == wire.ERR_NONE
    assert fe.wire_log.topic_configs["t"]["retention.ms"] == "1000"
    err, _ = _inc_alter(fe, version, [("retention.ms", 1, None)])
    assert err == wire.ERR_NONE
    assert "retention.ms" not in fe.wire_log.topic_configs["t"]


def test_incremental_alter_append_subtract(fe):
    _inc_alter(fe, 1, [("cleanup.policy", 0, "delete")])
    err, _ = _inc_alter(fe, 1, [("cleanup.policy", 2, "compact")])  # APPEND
    assert err == wire.ERR_NONE
    assert fe.wire_log.topic_configs["t"]["cleanup.policy"] == "delete,compact"
    # appending an existing element is a no-op, not a duplicate
    _inc_alter(fe, 1, [("cleanup.policy", 2, "compact")])
    assert fe.wire_log.topic_configs["t"]["cleanup.policy"] == "delete,compact"
    err, _ = _inc_alter(fe, 1, [("cleanup.policy", 3, "delete")])  # SUBTRACT
    assert err == wire.ERR_NONE
    assert fe.wire_log.topic_configs["t"]["cleanup.policy"] == "compact"


def test_incremental_alter_atomic_on_error(fe):
    _inc_alter(fe, 1, [("a", 0, "1")])
    # second entry invalid (SET without value) → nothing applies
    err, msg = _inc_alter(fe, 1, [("a", 0, "2"), ("b", 0, None)])
    assert err == 40  # INVALID_CONFIG
    assert fe.wire_log.topic_configs["t"]["a"] == "1"


def test_incremental_alter_validate_only(fe):
    err, _ = _inc_alter(fe, 1, [("x", 0, "9")], validate=True)
    assert err == wire.ERR_NONE
    assert "x" not in fe.wire_log.topic_configs.get("t", {})


def test_incremental_alter_unknown_topic(fe):
    err, msg = _inc_alter(fe, 1, [("a", 0, "1")], topic="nope")
    assert err == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION


# ---------------------------- txn/config/group mechanical lifts (r5)


def test_init_producer_id_v4_kip360_epoch_bump(fe):
    def init(version, tid=None, pid=-1, epoch=-1):
        flex = version >= 2
        w = _hdr(wire.Writer(), wire.INIT_PRODUCER_ID_KEY, version)
        w.compact_string(tid) if flex else w.nullable_string(tid)
        w.int32(60000)
        if version >= 3:
            w.int64(pid)
            w.int16(epoch)
        if flex:
            w.empty_tagged_fields()
        r = wire.Reader(fe.handle_request(w.bytes()))
        assert r.int32() == 77
        if flex:
            r.tagged_fields()
        assert r.int32() == 0
        assert r.int16() == wire.ERR_NONE
        return r.int64(), r.int16()

    pid0, e0 = init(0)
    assert e0 == 0
    pid2, e2 = init(2)  # flexible allocation
    assert pid2 != pid0 and e2 == 0
    # KIP-360: re-init WITH the current pid keeps it, bumps the epoch
    pid3, e3 = init(4, pid=pid0, epoch=0)
    assert (pid3, e3) == (pid0, 1)
    pid4, e4 = init(4, pid=pid0, epoch=1)
    assert (pid4, e4) == (pid0, 2)


@pytest.mark.parametrize("version", [1, 2, 3])
def test_add_partitions_and_end_txn_versions(fe, version):
    flex = version >= 3
    # allocate a transactional pid first (v0 path)
    w = _hdr(wire.Writer(), wire.INIT_PRODUCER_ID_KEY, 0)
    w.nullable_string("txl")
    w.int32(60000)
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32(), r.int32(), r.int16()
    pid, epoch = r.int64(), r.int16()

    w = _hdr(wire.Writer(), wire.ADD_PARTITIONS_TO_TXN_KEY, version)
    w.compact_string("txl") if flex else w.nullable_string("txl")
    w.int64(pid)
    w.int16(epoch)
    w.compact_array_len(1) if flex else w.int32(1)
    w.compact_string("t") if flex else w.nullable_string("t")
    w.compact_array_len(1) if flex else w.int32(1)
    w.int32(0)
    if flex:
        w.empty_tagged_fields()
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    assert r.int32() == 0
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert (r.compact_string() if flex else r.nullable_string()) == "t"
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE

    w = _hdr(wire.Writer(), wire.END_TXN_KEY, version)
    w.compact_string("txl") if flex else w.nullable_string("txl")
    w.int64(pid)
    w.int16(epoch)
    w.bool_(True)  # commit
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    assert r.int32() == 0
    assert r.int16() == wire.ERR_NONE


@pytest.mark.parametrize("version", [1, 2])
def test_delete_groups_versions(fe, version):
    flex = version >= 2
    w = _hdr(wire.Writer(), wire.DELETE_GROUPS_KEY, version)
    w.compact_array_len(1) if flex else w.int32(1)
    w.compact_string("nope") if flex else w.nullable_string("nope")
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    assert r.int32() == 0
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert (r.compact_string() if flex else r.nullable_string()) == "nope"
    assert r.int16() == 69  # GROUP_ID_NOT_FOUND


@pytest.mark.parametrize("version", [1, 3, 4])
def test_describe_configs_versions(fe, version):
    fe.wire_log.topic_configs["t"] = {"retention.ms": "5000"}
    flex = version >= 4
    w = _hdr(wire.Writer(), wire.DESCRIBE_CONFIGS_KEY, version)
    w.compact_array_len(1) if flex else w.int32(1)
    w.int8(2)  # TOPIC
    w.compact_string("t") if flex else w.nullable_string("t")
    w.compact_array_len(-1) if flex else w.int32(-1)  # all keys
    if flex:
        w.empty_tagged_fields()
    if version >= 1:
        w.bool_(False)  # include_synonyms
    if version >= 3:
        w.bool_(False)  # include_documentation
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    assert r.int32() == 0
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert r.int16() == wire.ERR_NONE
    assert (r.compact_string() if flex else r.nullable_string()) is None
    assert r.int8() == 2
    assert (r.compact_string() if flex else r.nullable_string()) == "t"
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert (r.compact_string() if flex else r.nullable_string()) == "retention.ms"
    assert (r.compact_string() if flex else r.nullable_string()) == "5000"
    assert r.bool_() is False  # read_only
    assert r.int8() == 1  # config_source (v1+)
    assert r.bool_() is False  # is_sensitive
    assert (r.compact_array_len() if flex else r.int32()) == 0  # synonyms
    if version >= 3:
        assert r.int8() == 0  # config_type
        assert (r.compact_string() if flex else r.nullable_string()) is None


@pytest.mark.parametrize("version", [1, 2])
def test_alter_configs_versions(fe, version):
    flex = version >= 2
    w = _hdr(wire.Writer(), wire.ALTER_CONFIGS_KEY, version)
    w.compact_array_len(1) if flex else w.int32(1)
    w.int8(2)
    w.compact_string("t") if flex else w.nullable_string("t")
    w.compact_array_len(1) if flex else w.int32(1)
    w.compact_string("retention.ms") if flex else w.nullable_string("retention.ms")
    w.compact_string("777") if flex else w.nullable_string("777")
    if flex:
        w.empty_tagged_fields()
        w.empty_tagged_fields()
    w.bool_(False)  # validate_only
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 77
    if flex:
        r.tagged_fields()
    assert r.int32() == 0
    assert (r.compact_array_len() if flex else r.int32()) == 1
    assert r.int16() == wire.ERR_NONE
    assert fe.wire_log.topic_configs["t"] == {"retention.ms": "777"}


# ------------------------------------ review follow-ups (r5)


def test_delete_topics_v6_unknown_uuid_gets_uuid_error_and_echo(fe):
    bogus = bytes(range(16))
    w = _hdr(wire.Writer(), wire.DELETE_TOPICS_KEY, 6)
    w.compact_array_len(1)
    w.compact_string(None)  # uuid-only addressing
    w.uuid(bogus)
    w.empty_tagged_fields()
    w.int32(5000)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.compact_array_len() == 1
    assert r.compact_string() is None  # name unknown
    assert r.uuid() == bogus  # REQUESTED id echoed for correlation
    assert r.int16() == wire.ERR_UNKNOWN_TOPIC_ID


def test_list_groups_includes_kip848_groups(fe):
    # create one classic and one KIP-848 group
    _join(fe, group="classic-g")
    w = wire.Writer()
    w.int16(wire.CONSUMER_GROUP_HEARTBEAT_KEY).int16(0).int32(5)
    w.nullable_string("cli")
    w.empty_tagged_fields()
    w.compact_string("g848")
    w.compact_string("")
    w.int32(0)
    w.compact_string(None)
    w.compact_string(None)
    w.int32(30000)
    w.compact_array_len(1)
    w.compact_string("t")
    w.compact_string(None)
    w.compact_array_len(-1)
    w.empty_tagged_fields()
    fe.handle_request(w.bytes())

    w = _hdr(wire.Writer(), wire.LIST_GROUPS_KEY, 5)
    w.compact_array_len(0)  # states filter
    w.compact_array_len(0)  # types filter
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32()
    r.tagged_fields()
    r.int32()
    assert r.int16() == wire.ERR_NONE
    rows = {}
    for _ in range(r.compact_array_len()):
        gid = r.compact_string()
        ptype = r.compact_string()
        state = r.compact_string()
        gtype = r.compact_string()
        r.tagged_fields()
        rows[gid] = (ptype, state, gtype)
    assert rows["classic-g"][2] == "classic"
    assert rows["g848"] == ("consumer", "Stable", "consumer")
    # types filter narrows to the 848 group only
    w = _hdr(wire.Writer(), wire.LIST_GROUPS_KEY, 5)
    w.compact_array_len(0)
    w.compact_array_len(1)
    w.compact_string("consumer")
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    r.int32(), r.tagged_fields(), r.int32()
    assert r.int16() == wire.ERR_NONE
    assert r.compact_array_len() == 1
    assert r.compact_string() == "g848"


def test_idempotent_stale_epoch_produce_is_fenced(fe):
    """KIP-360: after an epoch bump, a retry carrying the OLD epoch
    must be rejected — the bump wiped the sequence-dedup state, so
    without fencing the duplicate would re-append."""
    from kcore_spark.protocol.broker import ERR_INVALID_PRODUCER_EPOCH
    from kcore_spark.protocol.records import Record, encode_record_batch

    log = fe.wire_log
    pid, _ = log.init_producer_id()
    batch = encode_record_batch(
        [Record(b"k", b"v", 100)], base_offset=0, producer_id=pid,
        producer_epoch=0, base_sequence=0,
    )

    def produce(b):
        w = _hdr(wire.Writer(), wire.PRODUCE_KEY, 3, flex=False)
        w.nullable_string(None)  # transactional_id
        w.int16(-1)  # acks
        w.int32(1000)
        w.int32(1)
        w.nullable_string("t")
        w.int32(1)
        w.int32(0)
        w.nullable_bytes(b)
        r = wire.Reader(fe.handle_request(w.bytes()))
        r.int32()
        r.int32()  # topics len
        r.nullable_string()
        r.int32()
        r.int32()  # partition idx
        return r.int16()  # error

    assert produce(batch) == wire.ERR_NONE
    log.bump_idempotent_epoch(pid)  # client re-initialized (KIP-360)
    assert produce(batch) == ERR_INVALID_PRODUCER_EPOCH  # stale retry fenced
    new_batch = encode_record_batch(
        [Record(b"k", b"v2", 101)], base_offset=0, producer_id=pid,
        producer_epoch=1, base_sequence=0,
    )
    assert produce(new_batch) == wire.ERR_NONE  # bumped epoch proceeds

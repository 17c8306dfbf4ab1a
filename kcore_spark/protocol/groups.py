"""Consumer-group protocol surface: FindCoordinator (10),
OffsetCommit (8), OffsetFetch (9).

The reference declares the Consumer API as roadmap
(`/root/reference/README.md:48`); these are the coordinator-side
pieces a consumer needs for manual assignment (assign + commit +
resume). Group membership (JoinGroup/SyncGroup rebalancing) is
deferred — Kafka clients work without it via manual partition
assignment, which is also the natural mode when Spark Structured
Streaming is the consumer (it manages its own assignment).

Committed offsets live in the front-end's group store and are
mirrored to the parquet `__consumer_offsets` analog via
``sync_to_topic_log`` (same last-writer-wins contract as
sources/topic_log.py::commit_offset).
"""

from __future__ import annotations

import struct

from kcore_spark.protocol import wire

ERR_NONE = wire.ERR_NONE


def struct_version(payload: bytes) -> int:
    """The request's api_version straight from the frame header."""
    return struct.unpack(">h", payload[2:4])[0]


class GroupStore:
    """In-memory committed-offset store: (group, topic, partition) → offset."""

    def __init__(self) -> None:
        self._offsets: dict[tuple[str, str, int], int] = {}

    def commit(self, group: str, topic: str, partition: int, offset: int) -> None:
        self._offsets[(group, topic, partition)] = offset

    def fetch(self, group: str, topic: str, partition: int) -> int:
        return self._offsets.get((group, topic, partition), -1)

    def committed(self, group: str) -> dict[tuple[str, int], int]:
        """All (topic, partition) → offset commits of one group."""
        return {
            (t, p): off for (g, t, p), off in self._offsets.items() if g == group
        }

    def sync_to_topic_log(self, topic_log) -> int:
        """Mirror every commit into the durable parquet offsets store."""
        n = 0
        for (g, t, p), off in self._offsets.items():
            topic_log.commit_offset(g, t, p, off)
            n += 1
        return n


# ------------------------------------------------------ FindCoordinator v0


def handle_find_coordinator(payload: bytes, host: str, port: int) -> bytes:
    """FindCoordinator v0-v4: v1 adds request key_type + response
    throttle/error_message; v3 is the flexible encoding of the same
    single-key shape; v4 batches (coordinator_keys array in, a
    coordinators array out — KIP-699). Single node: the coordinator is
    always us, for group (0) and transaction (1) key types alike."""
    v = struct_version(payload)
    flex = v >= 3
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    if v >= 4:
        r.int8()  # key_type precedes the batched keys
        keys = [r.compact_string() or "" for _ in range(max(r.compact_array_len(), 0))]
    else:
        keys = [(r.compact_string() if flex else r.nullable_string()) or ""]
        if v >= 1 and r.pos < len(r.buf):
            r.int8()  # key_type
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    if v >= 1:
        w.int32(0)  # throttle_time_ms
    if v >= 4:
        w.compact_array_len(len(keys))
        for k in keys:
            w.compact_string(k)
            w.int32(0)  # node_id
            w.compact_string(host)
            w.int32(port)
            w.int16(ERR_NONE)
            w.compact_string(None)  # error_message
            w.empty_tagged_fields()
        w.empty_tagged_fields()
        return w.bytes()
    w.int16(ERR_NONE)
    if v >= 1:
        w.compact_string(None) if flex else w.nullable_string(None)  # error_message
    w.int32(0)  # node_id
    w.compact_string(host) if flex else w.nullable_string(host)
    w.int32(port)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------------ OffsetCommit v2


ERR_ILLEGAL_GENERATION = 22
ERR_UNKNOWN_MEMBER_ID_ = 25


def handle_offset_commit(store: GroupStore, payload: bytes, coordinator=None) -> bytes:
    """OffsetCommit v2-v8: v2-v4 carry retention_time_ms (dropped in
    v5); v6 adds committed_leader_epoch per partition (accepted,
    unused — single-broker logs have one epoch); v7 adds
    group_instance_id (static membership); v8 is the flexible
    encoding. v3+ responses prepend throttle_time_ms.

    Generation fencing (r13): a commit carrying generation_id >= 0 is
    a GROUP-MANAGED consumer's commit and is validated against the
    classic coordinator — unknown member answers UNKNOWN_MEMBER_ID,
    a stale generation answers ILLEGAL_GENERATION, and neither stores
    anything. Without this, a consumer kicked out by a rebalance
    (zombie) could overwrite the new owner's committed offsets — the
    offset-loss twin of the transactional-plane fencing the r13
    model fuzz exercised. generation_id -1 is the simple-consumer
    path (no group management): always accepted, unchanged."""
    r = wire.Reader(payload)
    v = struct_version(payload)
    flex = v >= 8
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    group = rd_str()
    generation_id = r.int32()
    member_id = rd_str() or ""
    if v >= 7:
        rd_str()  # group_instance_id
    if 2 <= v <= 4:
        r.int64()  # retention_time_ms
    fence_err = ERR_NONE
    if coordinator is not None and generation_id >= 0:
        g = coordinator.groups.get(group)
        if g is not None:
            coordinator._expire_stale(g)
        if g is not None and g.members:
            # the coordinator actively manages this group: validate the
            # committer. A group it has never seen (or whose members all
            # left) keeps the simple-consumer contract — commits land
            # unfenced, as before.
            if member_id not in g.members:
                fence_err = ERR_UNKNOWN_MEMBER_ID_
            elif generation_id != g.generation:
                fence_err = ERR_ILLEGAL_GENERATION
            else:
                coordinator._touch(g, member_id)
    results = []
    for _ in range(max(rd_len(), 0)):
        topic = rd_str()
        parts = []
        for _ in range(max(rd_len(), 0)):
            partition = r.int32()
            offset = r.int64()
            if v >= 6:
                r.int32()  # committed_leader_epoch
            rd_str()  # metadata
            if flex:
                r.tagged_fields()
            if fence_err == ERR_NONE:
                store.commit(group, topic, partition, offset)
            parts.append(partition)
        if flex:
            r.tagged_fields()
        results.append((topic, parts))
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    if v >= 3:
        w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(results)) if flex else w.int32(len(results))
    for topic, parts in results:
        w.compact_string(topic) if flex else w.nullable_string(topic)
        w.compact_array_len(len(parts)) if flex else w.int32(len(parts))
        for p in parts:
            w.int32(p).int16(fence_err)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------------ OffsetFetch v1


def _resolve_requested(
    store: GroupStore, group: str | None, n_topics: int, topics: list
) -> list:
    """null topics array → every topic the group has commits for."""
    if n_topics < 0:
        by_topic: dict[str, list[int]] = {}
        for (t, p) in sorted(store.committed(group)):
            by_topic.setdefault(t, []).append(p)
        return list(by_topic.items())
    return topics


def handle_offset_fetch(store: GroupStore, payload: bytes) -> bytes:
    """OffsetFetch v1-v9: v2+ allows a null topics array (= every topic
    the group has commits for) and appends a top-level error_code; v3
    prepends throttle_time_ms; v5 adds committed_leader_epoch per
    partition; v6 is the flexible encoding; v7 adds require_stable
    (KIP-447 — trivially satisfied here: commits are applied
    synchronously, so every committed offset is stable); v8 batches
    multiple groups per request (KIP-709) with per-group error codes;
    v9 adds member_id/member_epoch per group (KIP-848 — this classic
    store does not fence by epoch, so they are accepted and ignored)."""
    r = wire.Reader(payload)
    v = struct_version(payload)
    flex = v >= 6
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32

    def rd_topics() -> tuple[int, list]:
        n_topics = rd_len()
        topics = []
        for _ in range(max(n_topics, 0)):
            topic = rd_str()
            parts = [r.int32() for _ in range(max(rd_len(), 0))]
            if flex:
                r.tagged_fields()
            topics.append((topic, parts))
        return n_topics, topics

    # group_id → resolved [(topic, [partition])]
    groups: list[tuple[str | None, list]] = []
    if v >= 8:
        for _ in range(max(rd_len(), 0)):
            gid = rd_str()
            if v >= 9:
                rd_str()  # member_id (KIP-848): not fenced here
                r.int32()  # member_epoch
            n_topics, topics = rd_topics()
            r.tagged_fields()
            groups.append((gid, _resolve_requested(store, gid, n_topics, topics)))
    else:
        gid = rd_str()
        n_topics, topics = rd_topics()
        groups.append((gid, _resolve_requested(store, gid, n_topics if v >= 2 else 0, topics)))
    if v >= 7:
        r.bool_()  # require_stable

    def wr_topics(group: str | None, requested: list) -> None:
        w.compact_array_len(len(requested)) if flex else w.int32(len(requested))
        for topic, parts in requested:
            w.compact_string(topic) if flex else w.nullable_string(topic)
            w.compact_array_len(len(parts)) if flex else w.int32(len(parts))
            for partition in parts:
                w.int32(partition)
                w.int64(store.fetch(group, topic, partition))
                if v >= 5:
                    w.int32(-1)  # committed_leader_epoch: none recorded
                w.compact_string(None) if flex else w.nullable_string(None)  # metadata
                w.int16(ERR_NONE)
                if flex:
                    w.empty_tagged_fields()
            if flex:
                w.empty_tagged_fields()

    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    if v >= 3:
        w.int32(0)  # throttle_time_ms
    if v >= 8:
        w.compact_array_len(len(groups))
        for gid, requested in groups:
            w.compact_string(gid)
            wr_topics(gid, requested)
            w.int16(ERR_NONE)  # per-group error_code
            w.empty_tagged_fields()
    else:
        gid, requested = groups[0]
        wr_topics(gid, requested)
        if v >= 2:
            w.int16(ERR_NONE)  # top-level error_code
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------------ OffsetDelete v0

ERR_GROUP_ID_NOT_FOUND = 69


def handle_offset_delete(store: GroupStore, payload: bytes) -> bytes:
    """OffsetDelete (key 47, v0, rigid): remove committed offsets for
    the named (topic, partition) pairs of one group — the admin-side
    cleanup a long-lived deployment needs when retiring consumers.
    Partitions with no commit report UNKNOWN_TOPIC_OR_PARTITION; an
    unknown group reports GROUP_ID_NOT_FOUND at the top level (this
    coordinator has no group-state machine tied to the offset store, so
    'group exists' means 'has at least one commit')."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=False)
    group = r.nullable_string() or ""
    topics: list[tuple[str, list[int]]] = []
    for _ in range(r.int32()):
        name = r.nullable_string() or ""
        parts = [r.int32() for _ in range(r.int32())]
        topics.append((name, parts))
    known_group = bool(store.committed(group))
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.int16(wire.ERR_NONE if known_group else ERR_GROUP_ID_NOT_FOUND)
    w.int32(0)  # throttle_time_ms
    w.int32(len(topics))
    for name, parts in topics:
        w.nullable_string(name)
        w.int32(len(parts))
        for p in parts:
            if known_group and (group, name, p) in store._offsets:
                del store._offsets[(group, name, p)]
                perr = wire.ERR_NONE
            else:
                perr = wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
            w.int32(p).int16(perr)
    return w.bytes()

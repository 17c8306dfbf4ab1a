"""Group-membership coordinator: JoinGroup (11) v0-v5, SyncGroup (14)
v0-v3, Heartbeat (12) v0-v4, LeaveGroup (13) v0-v3.

Version deltas (public spec): JoinGroup v1 adds rebalance_timeout_ms;
v2+/v1+ responses prepend throttle_time_ms; JoinGroup v4 introduces
the MEMBER_ID_REQUIRED (79) two-step join — an empty member_id gets a
server-generated id and must REJOIN with it (KIP-394, duplicate-member
protection on client retries); v5 adds group_instance_id (static
membership, KIP-345) to request and member roster. SyncGroup v3 and
Heartbeat v3 add group_instance_id; Heartbeat v4 is flexible.
LeaveGroup v3 batches members [(member_id, group_instance_id)] with a
per-member response.

Completes the reference's Consumer API roadmap row
(`/root/reference/README.md:48`). Single-node semantics, simplified
per KIP-62-era protocol:

- first joiner becomes leader; every membership change bumps the
  generation and invalidates older generations (ILLEGAL_GENERATION);
- join completes immediately (no rebalance-delay barrier — with one
  coordinator and deterministic tests there is nothing to wait for);
- the leader pushes the full assignment map in SyncGroup; followers
  sync to fetch theirs;
- heartbeats validate (group, member, generation) only.

Group state is in-memory, like the wire log; committed offsets live
in groups.GroupStore (durable-synced separately).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from kcore_spark.protocol import wire

ERR_ILLEGAL_GENERATION = 22
ERR_UNKNOWN_MEMBER_ID = 25
ERR_GROUP_ID_NOT_FOUND = 69
ERR_MEMBER_ID_REQUIRED = 79


@dataclass
class GroupMembership:
    generation: int = 0
    members: list[str] = field(default_factory=list)  # join order; [0] is leader
    protocols: dict[str, bytes] = field(default_factory=dict)  # member → metadata
    protocol_name: str = ""
    protocol_type: str = ""
    assignments: dict[str, bytes] = field(default_factory=dict)
    next_member_seq: int = 0
    # ids handed out by the v4+ MEMBER_ID_REQUIRED dance, awaiting
    # rejoin. Insertion-ordered dict-as-set so the oldest id can be
    # expired: a client that keeps retrying with an EMPTY member_id
    # (or vanishes before rejoining) would otherwise grow this set
    # forever. Kafka expires these by session timeout; with no timer
    # wheel here, a FIFO cap bounds the same leak.
    pending: dict[str, None] = field(default_factory=dict)
    # liveness: member → (monotonic last-contact, session_timeout_ms
    # from its join). Drives lazy session expiry (_expire_stale).
    last_seen: dict[str, float] = field(default_factory=dict)
    session_timeout_ms: dict[str, int] = field(default_factory=dict)


# Max un-rejoined MEMBER_ID_REQUIRED ids remembered per group. Any real
# client rejoins within one round-trip, so depth tracks concurrent
# joiners, not history; 256 is far above any sane group fan-in.
MAX_PENDING_MEMBERS = 256


class Coordinator:
    def __init__(self, topic_partitions=None, clock=None) -> None:
        """topic_partitions: zero-arg callable returning the current
        {topic: partition_count} catalog — used for the server-side
        assignment fallback when a leader syncs without assignments.
        clock: zero-arg monotonic-seconds callable (injectable for
        tests); drives lazy session expiry."""
        import time

        self.groups: dict[str, GroupMembership] = {}
        self._topic_partitions = topic_partitions
        self._clock = clock or time.monotonic

    # ---------------------------------------------- session liveness

    def _touch(self, g: GroupMembership, member_id: str) -> None:
        g.last_seen[member_id] = self._clock()

    def _expire_stale(self, g: GroupMembership) -> None:
        """Lazy session expiry — the single-node stand-in for the
        broker's heartbeat timer wheel: any group access first removes
        members whose last contact is older than their own
        session.timeout.ms. Expiry bumps the generation and clears
        assignments (a rebalance), exactly what the timer would do;
        'lazy' only shifts WHEN the check runs (next group access),
        never its outcome."""
        now = self._clock()
        stale = [
            m
            for m in g.members
            if m in g.last_seen
            and (now - g.last_seen[m]) * 1000.0 > g.session_timeout_ms.get(m, 45_000)
        ]
        for m in stale:
            g.members.remove(m)
            g.protocols.pop(m, None)
            g.last_seen.pop(m, None)
            g.session_timeout_ms.pop(m, None)
        if stale:
            g.assignments.clear()
            g.generation += 1

    # -------------------------------------------------- JoinGroup v0

    def handle_join_group(self, payload: bytes) -> bytes:
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 6  # flexible encoding cutover per the upstream schema
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        rd_str = r.compact_string if flex else r.nullable_string
        rd_bytes = r.compact_bytes if flex else r.nullable_bytes
        rd_len = r.compact_array_len if flex else r.int32
        group_id = rd_str()
        session_timeout_ms = r.int32()
        if v >= 1:
            r.int32()  # rebalance_timeout_ms
        member_id = rd_str() or ""
        group_instance_id = rd_str() if v >= 5 else None
        protocol_type = rd_str() or ""
        protocols = []
        for _ in range(max(rd_len(), 0)):
            name, meta = rd_str(), rd_bytes()
            if flex:
                r.tagged_fields()
            protocols.append((name, meta))
        if v >= 8:
            rd_str()  # reason (KIP-800) — informational, not acted on
        if flex:
            r.tagged_fields()

        g = self.groups.setdefault(group_id, GroupMembership())
        self._expire_stale(g)
        g.protocol_type = protocol_type
        if not member_id and v >= 4:
            # KIP-394 two-step join: hand out an id, demand a rejoin —
            # a retried join with the handed-out id then lands exactly
            # once instead of creating a duplicate member
            member_id = f"member-{g.next_member_seq}"
            g.next_member_seq += 1
            g.pending[member_id] = None
            while len(g.pending) > MAX_PENDING_MEMBERS:
                g.pending.pop(next(iter(g.pending)))  # expire oldest
            return self._join_error(
                h.correlation_id, ERR_MEMBER_ID_REQUIRED, v, member_id=member_id
            )
        if member_id and member_id not in g.members and member_id not in g.pending:
            return self._join_error(h.correlation_id, ERR_UNKNOWN_MEMBER_ID, v)
        if member_id in g.pending:
            g.pending.pop(member_id, None)
            g.members.append(member_id)
            g.generation += 1
            g.assignments.clear()
        elif not member_id:
            member_id = f"member-{g.next_member_seq}"
            g.next_member_seq += 1
            g.members.append(member_id)
            g.generation += 1
            g.assignments.clear()  # membership changed → assignments stale
        g.protocols[member_id] = protocols[0][1] if protocols else b""
        g.protocol_name = protocols[0][0] if protocols else ""
        g.session_timeout_ms[member_id] = session_timeout_ms
        self._touch(g, member_id)

        leader = g.members[0]
        member_list = g.members if member_id == leader else []
        return self._encode_join_response(
            h.correlation_id,
            v,
            wire.ERR_NONE,
            generation=g.generation,
            protocol_type=g.protocol_type,
            protocol_name=g.protocol_name,
            leader=leader,
            member_id=member_id,
            members=[(m, g.protocols.get(m, b"")) for m in member_list],
        )

    def _join_error(
        self, corr: int, err: int, api_version: int = 0, member_id: str | None = None
    ) -> bytes:
        # MEMBER_ID_REQUIRED responses CARRY the assigned member id —
        # that is the whole point of the v4 dance
        return self._encode_join_response(
            corr,
            api_version,
            err,
            generation=-1,
            protocol_type=None,
            protocol_name=None,
            leader=None,
            member_id=member_id,
            members=[],
        )

    @staticmethod
    def _encode_join_response(
        corr: int,
        v: int,
        err: int,
        *,
        generation: int,
        protocol_type: str | None,
        protocol_name: str | None,
        leader: str | None,
        member_id: str | None,
        members: list[tuple[str, bytes]],
    ) -> bytes:
        flex = v >= 6
        w = wire.Writer()
        w.int32(corr)
        if flex:
            w.empty_tagged_fields()  # response header v1
        wr_str = w.compact_string if flex else w.nullable_string
        wr_bytes = w.compact_bytes if flex else w.nullable_bytes
        if v >= 2:
            w.int32(0)  # throttle_time_ms
        w.int16(err)
        w.int32(generation)
        if v >= 7:
            wr_str(protocol_type)  # nullable ProtocolType (KIP-430)
        wr_str(protocol_name)
        wr_str(leader)
        if v >= 9:
            w.int8(0)  # skip_assignment: server-side assignment not pushed
        wr_str(member_id)
        w.compact_array_len(len(members)) if flex else w.int32(len(members))
        for m, meta in members:
            wr_str(m)
            if v >= 5:
                wr_str(None)  # group_instance_id (dynamic member)
            wr_bytes(meta)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

    # -------------------------------------------------- SyncGroup v0

    def handle_sync_group(self, payload: bytes) -> bytes:
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 4  # flexible cutover per the upstream schema
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        rd_str = r.compact_string if flex else r.nullable_string
        rd_bytes = r.compact_bytes if flex else r.nullable_bytes
        rd_len = r.compact_array_len if flex else r.int32
        group_id = rd_str()
        generation = r.int32()
        member_id = rd_str()
        if v >= 3:
            rd_str()  # group_instance_id
        proto_type = rd_str() if v >= 5 else None  # KIP-430 echo fields
        proto_name = rd_str() if v >= 5 else None
        incoming = {}
        for _ in range(max(rd_len(), 0)):
            m = rd_str()
            incoming[m] = rd_bytes()
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()

        g = self.groups.get(group_id)
        err = wire.ERR_NONE
        assignment: bytes | None = b""
        if g is not None:
            self._expire_stale(g)
        if g is None:
            err = ERR_GROUP_ID_NOT_FOUND
        elif member_id not in g.members:
            err = ERR_UNKNOWN_MEMBER_ID
        elif generation != g.generation:
            err = ERR_ILLEGAL_GENERATION
        else:
            self._touch(g, member_id)
            if incoming and member_id == g.members[0]:  # leader distributes
                g.assignments = dict(incoming)
            elif (
                not g.assignments
                and member_id == g.members[0]
                and g.protocol_type in ("", "consumer")
            ):
                # server-side fallback (our TopicConsumer's convenience
                # path): leader synced without assignments — run the
                # negotiated assignor over the joined subscriptions.
                self._auto_assign(g)
            assignment = g.assignments.get(member_id, b"")
        w = wire.Writer()
        w.int32(h.correlation_id)
        if flex:
            w.empty_tagged_fields()  # response header v1
        if v >= 1:
            w.int32(0)  # throttle_time_ms
        w.int16(err)
        if v >= 5:
            # the response carries the GROUP's negotiated type/name
            # (the request fields are a client-side consistency check)
            w.compact_string(g.protocol_type or None if g is not None else None)
            w.compact_string(g.protocol_name or None if g is not None else None)
        w.compact_bytes(assignment) if flex else w.nullable_bytes(assignment)
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

    def _auto_assign(self, g: GroupMembership) -> None:
        from kcore_spark.protocol import assignor

        if g.protocol_name not in assignor.ASSIGNORS or self._topic_partitions is None:
            return
        try:
            subs = {m: g.protocols.get(m, b"") for m in g.members}
            g.assignments = assignor.assign(g.protocol_name, subs, self._topic_partitions())
        except (EOFError, ValueError, KeyError):
            return  # undecodable metadata: leave assignment to the leader

    # -------------------------------------------------- Heartbeat v0

    def handle_heartbeat(self, payload: bytes) -> bytes:
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 4
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        rd_str = r.compact_string if flex else r.nullable_string
        group_id = rd_str()
        generation = r.int32()
        member_id = rd_str()
        if v >= 3:
            rd_str()  # group_instance_id
        g = self.groups.get(group_id)
        if g is not None:
            self._expire_stale(g)
        if g is None:
            err = ERR_GROUP_ID_NOT_FOUND
        elif member_id not in g.members:
            err = ERR_UNKNOWN_MEMBER_ID
        elif generation != g.generation:
            err = ERR_ILLEGAL_GENERATION
        else:
            err = wire.ERR_NONE
            self._touch(g, member_id)
        w = wire.Writer()
        w.int32(h.correlation_id)
        if flex:
            w.empty_tagged_fields()  # response header v1
        if v >= 1:
            w.int32(0)  # throttle_time_ms
        w.int16(err)
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

    # -------------------------------------------------- LeaveGroup v0-v5

    def handle_leave_group(self, payload: bytes) -> bytes:
        """LeaveGroup v0-v5: v1 adds throttle_time_ms, v3 batches
        members (KIP-345 static membership), v4 is the flexible
        encoding, v5 adds a per-member leave reason (KIP-800,
        diagnostic only)."""
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 4
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        rd_str = r.compact_string if flex else r.nullable_string
        rd_len = r.compact_array_len if flex else r.int32
        group_id = rd_str()
        if v >= 3:
            # batched members (KIP-345): [(member_id, group_instance_id)]
            members = []
            for _ in range(max(rd_len(), 0)):
                member_id = rd_str()
                inst = rd_str()
                if v >= 5:
                    rd_str()  # reason (KIP-800): logged by real brokers
                if flex:
                    r.tagged_fields()
                members.append((member_id, inst))
        else:
            members = [(rd_str(), None)]
        g = self.groups.get(group_id)
        results: list[tuple[str | None, str | None, int]] = []
        for member_id, inst in members:
            if g is None:
                results.append((member_id, inst, ERR_GROUP_ID_NOT_FOUND))
            elif member_id not in g.members:
                results.append((member_id, inst, ERR_UNKNOWN_MEMBER_ID))
            else:
                g.members.remove(member_id)
                g.protocols.pop(member_id, None)
                g.last_seen.pop(member_id, None)
                g.session_timeout_ms.pop(member_id, None)
                g.assignments.clear()
                g.generation += 1
                results.append((member_id, inst, wire.ERR_NONE))
        if g is None:
            top_err = ERR_GROUP_ID_NOT_FOUND
        elif v >= 3:
            top_err = wire.ERR_NONE  # per-member errors carry the detail
        else:
            top_err = results[0][2]
        w = wire.Writer()
        w.int32(h.correlation_id)
        if flex:
            w.empty_tagged_fields()  # response header v1
        if v >= 1:
            w.int32(0)  # throttle_time_ms
        w.int16(top_err)
        if v >= 3:
            w.compact_array_len(len(results)) if flex else w.int32(len(results))
            for member_id, inst, err in results:
                w.compact_string(member_id) if flex else w.nullable_string(member_id)
                w.compact_string(inst) if flex else w.nullable_string(inst)
                w.int16(err)
                if flex:
                    w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

    # ------------------------------------------ group admin (15/16/42)

    def handle_list_groups(
        self, payload: bytes, extra_groups: list[tuple[str, str, str, str]] | None = None
    ) -> bytes:
        """ListGroups v0-v5: v1 adds throttle_time_ms, v3 is the
        flexible encoding, v4 adds the states_filter (KIP-518) and the
        per-group state in the response, v5 adds the types_filter
        (KIP-848 'classic'/'consumer') and per-group type. This
        coordinator's own groups are classic-protocol; the dispatcher
        passes the KIP-848 coordinator's groups as ``extra_groups``
        rows (group_id, protocol_type, state, group_type) so one
        listing covers both protocols, like a real broker."""
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 3
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        states_filter: list[str] = []
        types_filter: list[str] = []
        if v >= 4:
            states_filter = [
                r.compact_string() or "" for _ in range(max(r.compact_array_len(), 0))
            ]
        if v >= 5:
            types_filter = [
                r.compact_string() or "" for _ in range(max(r.compact_array_len(), 0))
            ]
        rows = [
            (gid, g.protocol_type, self._group_state(g), "classic")
            for gid, g in self.groups.items()
        ] + list(extra_groups or [])
        listed = sorted(
            (row for row in rows
             if (not states_filter or row[2] in states_filter)
             and (not types_filter or row[3] in types_filter)),
        )
        w = wire.Writer()
        w.int32(h.correlation_id)
        if flex:
            w.empty_tagged_fields()  # response header v1
        if v >= 1:
            w.int32(0)  # throttle_time_ms
        w.int16(wire.ERR_NONE)
        w.compact_array_len(len(listed)) if flex else w.int32(len(listed))
        for gid, ptype, state, gtype in listed:
            w.compact_string(gid) if flex else w.nullable_string(gid)
            w.compact_string(ptype) if flex else w.nullable_string(ptype)
            if v >= 4:
                w.compact_string(state)
            if v >= 5:
                w.compact_string(gtype)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

    def _group_state(self, g: GroupMembership) -> str:
        if not g.members:
            return "Empty"
        return "Stable" if g.assignments else "CompletingRebalance"

    def handle_describe_groups(self, payload: bytes) -> bytes:
        """DescribeGroups v0-v5: state, protocol, and full member
        roster (metadata + current assignment) per requested group.
        Version deltas: v1 adds throttle_time_ms, v3 adds the
        include_authorized_operations flag and the per-group
        authorized_operations bitfield (all-operations-allowed here —
        this broker has no ACLs), v4 adds group_instance_id per member
        (KIP-345), v5 is the flexible encoding."""
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 5
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        rd_str = r.compact_string if flex else r.nullable_string
        rd_len = r.compact_array_len if flex else r.int32
        names = [rd_str() for _ in range(max(rd_len(), 0))]
        include_authz = r.bool_() if v >= 3 else False
        w = wire.Writer()
        w.int32(h.correlation_id)
        if flex:
            w.empty_tagged_fields()  # response header v1
        if v >= 1:
            w.int32(0)  # throttle_time_ms
        w.compact_array_len(len(names)) if flex else w.int32(len(names))
        wr_str = w.compact_string if flex else w.nullable_string

        def wr_authz() -> None:
            if v >= 3:
                # INT32_MIN = "not requested"; 0 = no ACL restrictions
                w.int32(0 if include_authz else -2147483648)

        for gid in names:
            g = self.groups.get(gid)
            if g is None:
                w.int16(ERR_GROUP_ID_NOT_FOUND)
                wr_str(gid)
                wr_str("Dead")
                wr_str("")
                wr_str("")
                w.compact_array_len(0) if flex else w.int32(0)
                wr_authz()
                if flex:
                    w.empty_tagged_fields()
                continue
            w.int16(wire.ERR_NONE)
            wr_str(gid)
            wr_str(self._group_state(g))
            wr_str(g.protocol_type)
            wr_str(g.protocol_name if g.members else "")
            w.compact_array_len(len(g.members)) if flex else w.int32(len(g.members))
            for m in g.members:
                wr_str(m)
                if v >= 4:
                    wr_str(None)  # group_instance_id (dynamic member)
                wr_str("")  # client_id (not tracked)
                wr_str("")  # client_host
                if flex:
                    w.compact_bytes(g.protocols.get(m, b""))
                    w.compact_bytes(g.assignments.get(m, b""))
                    w.empty_tagged_fields()
                else:
                    w.nullable_bytes(g.protocols.get(m, b""))
                    w.nullable_bytes(g.assignments.get(m, b""))
            wr_authz()
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

    def handle_delete_groups(self, payload: bytes) -> bytes:
        """DeleteGroups v0-v2 (schema-identical through v1, flexible at
        v2): only EMPTY groups are deletable (the Kafka contract —
        active members must leave first, NON_EMPTY_GROUP error 68
        otherwise)."""
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        flex = v >= 2
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=flex)
        rd_str = r.compact_string if flex else r.nullable_string
        rd_len = r.compact_array_len if flex else r.int32
        names = [rd_str() for _ in range(max(rd_len(), 0))]
        results = []
        for gid in names:
            g = self.groups.get(gid)
            if g is None:
                results.append((gid, ERR_GROUP_ID_NOT_FOUND))
            elif g.members:
                results.append((gid, 68))  # NON_EMPTY_GROUP
            else:
                del self.groups[gid]
                results.append((gid, wire.ERR_NONE))
        w = wire.Writer()
        w.int32(h.correlation_id)
        if flex:
            w.empty_tagged_fields()  # response header v1
        w.int32(0)  # throttle_time_ms
        w.compact_array_len(len(results)) if flex else w.int32(len(results))
        for gid, err in results:
            w.compact_string(gid) if flex else w.nullable_string(gid)
            w.int16(err)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
        return w.bytes()

"""KIP-848 next-generation consumer group protocol:
ConsumerGroupHeartbeat (API key 68, v0, always flexible).

The modern replacement for the classic JoinGroup/SyncGroup dance
(coordinator.py): one heartbeat RPC carries join, subscription
changes, assignment reconciliation, and leave. Kafka 4.x clients
speak this first, so the reference's Consumer API roadmap row
(`/root/reference/README.md:48`) maps here for modern clients.

Epoch model (per the KIP):
- The GROUP epoch bumps whenever membership or any member's
  subscriptions change; each bump recomputes the server-side TARGET
  assignment for every member.
- Each MEMBER carries a member epoch = the group epoch whose target
  it has fully reconciled to. A heartbeat with any other epoch than
  the coordinator's record of that member is fenced
  (FENCED_MEMBER_EPOCH) — the member must rejoin with epoch 0.
- Reconciliation is INCREMENTAL: a member may not take ownership of a
  partition until the previous owner has revoked it. The coordinator
  therefore keeps per-member ``current`` (confirmed owned) sets; a
  member whose current set contains partitions now targeted at
  another member is first told to shrink (same epoch, reduced
  assignment) and only advances to the new epoch once it reports (via
  the request's topic_partitions field) that it no longer owns them.

Single-broker simplifications, matching coordinator.py's stance: no
session-timeout timer wheel (a member leaves via epoch -1/-2 or is
replaced on id reuse). Two server assignors are implemented (see
``_compute_assignment``): "uniform" (round-robin per topic, KIP-848's
default) and "range" (one contiguous chunk per member per topic, the
co-partitioned-join-friendly layout).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from kcore_spark.protocol import wire

CONSUMER_GROUP_HEARTBEAT_KEY = 68

ERR_INVALID_REQUEST = 42
ERR_UNKNOWN_MEMBER_ID = 25
ERR_GROUP_ID_NOT_FOUND = 69
ERR_FENCED_MEMBER_EPOCH = 110
ERR_UNSUPPORTED_ASSIGNOR = 112

HEARTBEAT_INTERVAL_MS = 3000
SUPPORTED_ASSIGNORS = ("uniform", "range")

# member_epoch sentinels in the request (per the KIP)
LEAVE_EPOCH = -1
STATIC_LEAVE_EPOCH = -2


@dataclass
class MemberState:
    member_epoch: int = 0
    # resolved subscription set: explicit names ∪ catalog topics
    # matching the member's regex (what the assignor consumes)
    subscriptions: tuple[str, ...] = ()
    explicit_subs: tuple[str, ...] = ()
    regex: str | None = None  # v1 subscribed_topic_regex, raw pattern
    instance_id: str | None = None
    rack: str | None = None  # client.rack, echoed in describe; assignment
    # stays rack-neutral on a single-node broker (no replica racks to
    # match against — same reason upstream's rack-aware path no-ops
    # when every replica is on one rack)
    rebalance_timeout_ms: int = 30000
    last_seen: float = 0.0  # monotonic seconds; drives session expiry
    # partition ownership, topic → sorted tuple of partition ids
    current: dict[str, tuple[int, ...]] = field(default_factory=dict)
    target: dict[str, tuple[int, ...]] = field(default_factory=dict)


@dataclass
class ConsumerGroup:
    group_epoch: int = 0
    members: dict[str, MemberState] = field(default_factory=dict)
    next_member_seq: int = 0
    # {topic: partition_count} over the members' subscribed topics as
    # of the last target computation — the KIP bumps the group epoch
    # when "the partition metadata changes", so a partition expansion
    # or topic deletion must retarget a STABLE group (model-fuzz find,
    # r13: expanded partitions were never assigned until unrelated
    # membership churn)
    metadata_snapshot: dict[str, int] = field(default_factory=dict)
    # server-side assignor in force: None until a joining member states
    # a preference (describe reports the default until then). A join
    # declaring a DIFFERENT assignor switches the group (last join
    # wins) and re-targets — the single-coordinator analog of
    # group.consumer.assignors precedence.
    assignor: str | None = None


class ConsumerGroupCoordinator:
    def __init__(
        self, topic_partitions=None, session_timeout_ms: int = 45_000, clock=None
    ) -> None:
        """``topic_partitions``: zero-arg callable returning the
        current {topic: partition_count} catalog (same contract as
        coordinator.Coordinator). ``session_timeout_ms`` is the
        group-level liveness bound (KIP-848 moves it from a client
        join field to group config — group.consumer.session.timeout.ms,
        default 45 s); ``clock`` is an injectable monotonic-seconds
        source for tests."""
        import time

        self.groups: dict[str, ConsumerGroup] = {}
        self._topic_partitions = topic_partitions or (lambda: {})
        self.session_timeout_ms = session_timeout_ms
        self._clock = clock or time.monotonic

    def _resolve_subs(
        self, explicit: tuple[str, ...], regex: str | None
    ) -> tuple[str, ...]:
        """Effective subscription set: explicit names ∪ catalog topics
        fullmatching the member's regex (v1 subscribed_topic_regex).
        Sorted for determinism. Raises ValueError on a pattern the
        engine cannot compile (surfaced as INVALID_REQUEST — this
        broker predates a dedicated regex error code)."""
        if not regex:
            return tuple(explicit)
        import re as _re

        try:
            pat = _re.compile(regex)
        except _re.error as exc:
            raise ValueError(f"invalid subscribed_topic_regex: {exc}") from None
        matched = {t for t in self._topic_partitions() if pat.fullmatch(t)}
        return tuple(sorted(matched.union(explicit)))

    def _expire_stale(self, g: ConsumerGroup) -> None:
        """Lazy session expiry (the timer-wheel stand-in, same stance
        as coordinator.Coordinator): drop members whose last heartbeat
        is older than the group session timeout, bump the group epoch,
        and recompute targets so survivors absorb the freed
        partitions on their next heartbeat."""
        now = self._clock()
        stale = [
            mid
            for mid, m in g.members.items()
            if (now - m.last_seen) * 1000.0 > self.session_timeout_ms
        ]
        for mid in stale:
            del g.members[mid]
        if stale:
            g.group_epoch += 1
            self._recompute_targets(g)

    # ------------------------------------------------ target assignment

    def _subscribed_metadata(self, g: ConsumerGroup) -> dict[str, int]:
        catalog = self._topic_partitions()
        subs: set[str] = set()
        for m in g.members.values():
            subs.update(m.subscriptions)
        return {t: catalog[t] for t in subs if t in catalog}

    def _maybe_retarget_on_metadata(self, g: ConsumerGroup) -> None:
        """KIP-848: the group epoch bumps when the partition metadata
        of any subscribed topic changes — a partition expansion must
        reach a stable group (the new partitions retarget on the next
        heartbeat), and a deleted topic's partitions must leave the
        targets (members then drop them at their next epoch advance).
        Cheap when nothing changed: len(subscriptions) dict lookups."""
        if not g.members:
            return
        if self._subscribed_metadata(g) != g.metadata_snapshot:
            g.group_epoch += 1
            self._recompute_targets(g)

    def _recompute_targets(self, g: ConsumerGroup) -> None:
        """Server-side assignors (dispatch on the group's selected
        assignor): "uniform" hands each topic's partitions to the
        subscribed members (sorted by id for determinism) round-robin;
        "range" hands each member one CONTIGUOUS chunk per topic (the
        RangeAssignor shape — co-partitioned topics land the same
        partition numbers on the same member, which is what keeps
        partition-aligned joins local on the consumer side). Both are
        O(members + partitions); runs once per group-epoch bump, never
        per heartbeat."""
        g.metadata_snapshot = self._subscribed_metadata(g)
        catalog = self._topic_partitions()
        use_range = g.assignor == "range"
        for m in g.members.values():
            m.target = {}
        for topic in sorted(catalog):
            n_parts = catalog[topic]
            subscribers = sorted(
                mid for mid, m in g.members.items() if topic in m.subscriptions
            )
            if not subscribers:
                continue
            per: dict[str, list[int]] = {mid: [] for mid in subscribers}
            if use_range:
                k = len(subscribers)
                base, extra = divmod(n_parts, k)
                start = 0
                for i, mid in enumerate(subscribers):
                    width = base + (1 if i < extra else 0)
                    per[mid] = list(range(start, start + width))
                    start += width
            else:
                for p in range(n_parts):
                    per[subscribers[p % len(subscribers)]].append(p)
            for mid, parts in per.items():
                if parts:
                    g.members[mid].target[topic] = tuple(parts)

    @staticmethod
    def _clamp_owned(
        owned: dict[str, tuple[int, ...]], granted: dict[str, tuple[int, ...]]
    ) -> dict[str, tuple[int, ...]]:
        """Intersect a member's owned-partitions report with what the
        coordinator actually granted it. Honest reports only ever
        SHRINK confirmed ownership (revocations), so the intersection
        is lossless for well-behaved clients; a buggy client claiming
        a foreign partition must not park it in its confirmed set —
        that both double-owns the partition in the coordinator's view
        and stalls the real owner's reconciliation (model-fuzz find,
        r13, tests/test_protocol_model_fuzz.py)."""
        out = {
            t: tuple(p for p in ps if p in granted.get(t, ()))
            for t, ps in owned.items()
        }
        return {t: ps for t, ps in out.items() if ps}

    @staticmethod
    def _owned_elsewhere(g: ConsumerGroup, mid: str) -> set[tuple[str, int]]:
        """(topic, partition) pairs targeted at OTHER members — the set
        this member must revoke before it can advance epochs."""
        taken: set[tuple[str, int]] = set()
        for other_id, other in g.members.items():
            if other_id == mid:
                continue
            for topic, parts in other.target.items():
                taken.update((topic, p) for p in parts)
        return taken

    # ------------------------------------------------ wire handler

    def handle_heartbeat(self, payload: bytes) -> bytes:
        import struct as _struct

        v = _struct.unpack(">h", payload[2:4])[0]
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=True)
        group_id = r.compact_string() or ""
        member_id = r.compact_string() or ""
        member_epoch = r.int32()
        instance_id = r.compact_string()
        rack_id = r.compact_string()
        rebalance_timeout_ms = r.int32()
        n_subs = r.compact_array_len()
        subscriptions: tuple[str, ...] | None = None
        if n_subs >= 0:
            subscriptions = tuple(r.compact_string() or "" for _ in range(n_subs))
        # v1 (KIP-848 follow-up, Kafka 4.0): regex subscription — null
        # = unchanged, "" = clear, else an RE2-style pattern resolved
        # server-side against the topic catalog
        subscribed_regex = r.compact_string() if v >= 1 else None
        server_assignor = r.compact_string()
        n_owned = r.compact_array_len()
        owned: dict[str, tuple[int, ...]] | None = None
        if n_owned >= 0:
            owned = {}
            by_id = {wire.topic_uuid(t): t for t in self._topic_partitions()}
            for _ in range(n_owned):
                tid = r.uuid()
                parts = tuple(r.int32() for _ in range(max(r.compact_array_len(), 0)))
                r.tagged_fields()
                name = by_id.get(tid)
                if name is not None:
                    owned[name] = tuple(sorted(parts))
        r.tagged_fields()

        if server_assignor is not None and server_assignor not in SUPPORTED_ASSIGNORS:
            return self._error(
                h.correlation_id,
                ERR_UNSUPPORTED_ASSIGNOR,
                f"assignor {server_assignor!r} not supported",
            )

        g = self.groups.setdefault(group_id, ConsumerGroup())
        self._expire_stale(g)
        self._maybe_retarget_on_metadata(g)

        # ---- leave (epoch -1 dynamic, -2 static)
        if member_epoch in (LEAVE_EPOCH, STATIC_LEAVE_EPOCH):
            if member_id in g.members:
                del g.members[member_id]
                g.group_epoch += 1
                self._recompute_targets(g)
            return self._ok(h.correlation_id, member_id, member_epoch, None)

        if member_epoch < 0:
            return self._error(h.correlation_id, ERR_INVALID_REQUEST, "bad member epoch")

        # ---- join (epoch 0): new member, or a known member rejoining
        if member_epoch == 0:
            if not member_id and instance_id:
                # static membership (KIP-848 carries KIP-345 forward):
                # a restarted static instance joins with an EMPTY
                # member id — it must take over its old member entry
                # (same id, same confirmed ownership) instead of
                # ghosting it until session expiry, which would both
                # double-count the group and park the old assignment
                for mid, existing in g.members.items():
                    if existing.instance_id == instance_id:
                        member_id = mid
                        break
            if not member_id:
                member_id = f"cg-member-{g.next_member_seq}"
                g.next_member_seq += 1
            prior = g.members.get(member_id)
            # null = unchanged applies to EVERY heartbeat, including a
            # rejoin at epoch 0: a member mid-revocation (its epoch is
            # still 0 until its inherited ownership stops overlapping
            # other members' targets) heartbeats again at epoch 0, and
            # wiping its subscriptions/instance/rack because the
            # "unchanged" fields were null both dropped static identity
            # and churned the whole group's targets (model-fuzz find,
            # r13). A genuinely NEW member must state a subscription.
            if prior is None and subscriptions is None and not subscribed_regex:
                return self._error(
                    h.correlation_id,
                    ERR_INVALID_REQUEST,
                    "initial join must declare subscribed topics or a regex",
                )
            eff_subs = (
                subscriptions
                if subscriptions is not None
                else (prior.explicit_subs if prior is not None else ())
            )
            if subscribed_regex is not None:
                regex = subscribed_regex or None  # "" clears
            else:
                regex = prior.regex if prior is not None else None
            try:
                resolved = self._resolve_subs(eff_subs, regex)
            except ValueError as exc:
                return self._error(h.correlation_id, ERR_INVALID_REQUEST, str(exc))
            m = MemberState(
                subscriptions=resolved,
                explicit_subs=eff_subs,
                regex=regex,
                instance_id=(
                    instance_id
                    if instance_id is not None
                    else (prior.instance_id if prior is not None else None)
                ),
                rack=(
                    rack_id
                    if rack_id is not None
                    else (prior.rack if prior is not None else None)
                ),
                rebalance_timeout_ms=rebalance_timeout_ms,
                last_seen=self._clock(),
            )
            old = g.members.get(member_id)
            if old is not None and owned is None:
                # rejoin without an owned report keeps confirmed
                # ownership (the member is re-reconciled, not restarted)
                m.current = old.current
            elif owned is not None:
                # the join's owned report is authoritative — a fenced
                # member rejoining with owned={} has dropped everything,
                # and ignoring that would deadlock its own revocations —
                # but clamped to what this member id was last granted
                # (a brand-new member was granted nothing)
                m.current = self._clamp_owned(
                    owned, old.current if old is not None else {}
                )
            g.members[member_id] = m
            # a join declaring an assignor selects it for the group
            # (last join wins; a switch re-targets everyone)
            assignor_changed = (
                server_assignor is not None and server_assignor != g.assignor
            )
            if server_assignor is not None:
                g.assignor = server_assignor
            # only an actual membership, subscription, or assignor
            # change bumps the group epoch; a same-id rejoin with
            # unchanged subscriptions re-reconciles against the
            # EXISTING targets (bumping per join heartbeat would
            # re-assign — and churn the whole group — on every retry
            # of a stuck member)
            if old is None or old.subscriptions != resolved or assignor_changed:
                g.group_epoch += 1
                self._recompute_targets(g)
            else:
                m.target = old.target  # targets survive the rejoin
            return self._reconcile(h.correlation_id, g, member_id, joined=True)

        # ---- steady state
        m = g.members.get(member_id)
        if m is None:
            return self._error(h.correlation_id, ERR_UNKNOWN_MEMBER_ID, "unknown member")
        if member_epoch != m.member_epoch:
            return self._error(
                h.correlation_id, ERR_FENCED_MEMBER_EPOCH, "fenced member epoch"
            )
        m.last_seen = self._clock()
        if rack_id is not None:
            m.rack = rack_id
        if subscriptions is not None:
            m.explicit_subs = subscriptions
        if subscribed_regex is not None:
            # null = unchanged; "" = clear; else replace the pattern
            m.regex = subscribed_regex or None
        # re-resolve every heartbeat: regex members lazily pick up
        # topics created after they subscribed (Kafka's coordinator
        # re-evaluates regexes on its own cadence; the heartbeat IS
        # this coordinator's cadence). Any change in the effective set
        # is a subscription change → epoch bump + new targets.
        try:
            resolved = self._resolve_subs(m.explicit_subs, m.regex)
        except ValueError as exc:
            return self._error(h.correlation_id, ERR_INVALID_REQUEST, str(exc))
        if resolved != m.subscriptions:
            m.subscriptions = resolved
            g.group_epoch += 1
            self._recompute_targets(g)
        if owned is not None:
            # the member's report of what it still owns drives the
            # revocation half of reconciliation — clamped to its
            # previously-confirmed set (reports can only shrink)
            m.current = self._clamp_owned(owned, m.current)
        return self._reconcile(h.correlation_id, g, member_id, joined=False)

    # ------------------------------------------------ reconciliation

    @staticmethod
    def _confirmed_elsewhere(g: ConsumerGroup, mid: str) -> set[tuple[str, int]]:
        """(topic, partition) pairs another member still CONFIRMS
        owning — nothing may be granted out of this set, whatever the
        targets say (the no-concurrent-owner invariant)."""
        held: set[tuple[str, int]] = set()
        for other_id, other in g.members.items():
            if other_id == mid:
                continue
            for topic, parts in other.current.items():
                held.update((topic, p) for p in parts)
        return held

    def _reconcile(self, corr: int, g: ConsumerGroup, mid: str, joined: bool) -> bytes:
        m = g.members[mid]
        if m.member_epoch == g.group_epoch and not joined:
            if m.current == m.target:
                # fully reconciled: heartbeat-only, assignment omitted
                return self._ok(corr, mid, m.member_epoch, None)
            # at the current epoch but still awaiting withheld target
            # partitions: re-grant whatever has been freed since
            held = self._confirmed_elsewhere(g, mid)
            grant = {
                t: tuple(p for p in parts if (t, p) not in held)
                for t, parts in m.target.items()
            }
            grant = {t: ps for t, ps in grant.items() if ps}
            if grant == m.current:
                return self._ok(corr, mid, m.member_epoch, None)
            m.current = dict(grant)
            return self._ok(corr, mid, m.member_epoch, grant)
        taken = self._owned_elsewhere(g, mid)
        still_revoking = {
            (t, p) for t, parts in m.current.items() for p in parts
        } & taken
        if still_revoking:
            # shrink first, same epoch: everything currently owned
            # minus what other members' targets claim
            reduced = {
                t: tuple(p for p in parts if (t, p) not in taken)
                for t, parts in m.current.items()
            }
            reduced = {t: ps for t, ps in reduced.items() if ps}
            return self._ok(corr, mid, m.member_epoch, reduced)
        # nothing pending revocation on OUR side → advance to the group
        # epoch, but grant only the target partitions no other member
        # still CONFIRMS owning (their shrink may not have happened
        # yet) — the withheld remainder arrives on later heartbeats as
        # the previous owners report the revocations. This preserves
        # the no-concurrent-owner invariant across the handover window.
        held = self._confirmed_elsewhere(g, mid)
        grant = {
            t: tuple(p for p in parts if (t, p) not in held)
            for t, parts in m.target.items()
        }
        grant = {t: ps for t, ps in grant.items() if ps}
        m.member_epoch = g.group_epoch
        m.current = dict(grant)
        return self._ok(corr, mid, m.member_epoch, grant)

    # ------------------------------------------------ encoding

    def _ok(
        self,
        corr: int,
        member_id: str,
        member_epoch: int,
        assignment: dict[str, tuple[int, ...]] | None,
    ) -> bytes:
        w = wire.Writer()
        w.int32(corr)
        w.empty_tagged_fields()  # response header v1
        w.int32(0)  # throttle_time_ms
        w.int16(wire.ERR_NONE)
        w.compact_string(None)  # error_message
        w.compact_string(member_id)
        w.int32(member_epoch)
        w.int32(HEARTBEAT_INTERVAL_MS)
        if assignment is None:
            w.int8(-1)  # nullable struct: unchanged
        else:
            w.int8(1)
            w.compact_array_len(len(assignment))
            for topic in sorted(assignment):
                w.uuid(wire.topic_uuid(topic))
                parts = assignment[topic]
                w.compact_array_len(len(parts))
                for p in parts:
                    w.int32(p)
                w.empty_tagged_fields()
            w.empty_tagged_fields()  # assignment struct
        w.empty_tagged_fields()
        return w.bytes()

    def _error(self, corr: int, err: int, msg: str) -> bytes:
        w = wire.Writer()
        w.int32(corr)
        w.empty_tagged_fields()
        w.int32(0)
        w.int16(err)
        w.compact_string(msg)
        w.compact_string(None)  # member_id
        w.int32(0)
        w.int32(HEARTBEAT_INTERVAL_MS)
        w.int8(-1)  # assignment null
        w.empty_tagged_fields()
        return w.bytes()

    # ------------------------------------------------ admin read-side

    def group_summaries(self) -> list[tuple[str, str, str, str]]:
        """(group_id, protocol_type, state, group_type) rows for
        ListGroups — KIP-848 groups must appear in the same listing as
        classic ones or admin tooling can never discover them."""
        return [
            (gid, "consumer", self._group_state(g), "consumer")
            for gid, g in self.groups.items()
        ]

    # ------------------------------------------------ describe (k69)

    def _group_state(self, g: ConsumerGroup) -> str:
        if not g.members:
            return "Empty"
        if all(m.member_epoch == g.group_epoch for m in g.members.values()):
            return "Stable"
        return "Reconciling"

    def handle_describe(self, payload: bytes) -> bytes:
        """ConsumerGroupDescribe (API key 69, v0-v1, flexible): the
        KIP-848 admin read-side — epoch, state, and per-member
        subscription + confirmed/target assignment for each requested
        group. Groups this coordinator has never seen report
        GROUP_ID_NOT_FOUND with a Dead state, matching the upstream
        contract for describe-on-missing.

        v1 (the request body is unchanged) appends MemberType int8 to
        each member in the response — -1 unknown, 0 classic, 1
        consumer (the KIP-848 protocol). Every member this coordinator
        serves joined via ConsumerGroupHeartbeat, so it always reports
        1. Field layout pinned by spec-derived golden bytes
        (tests/test_golden_bytes.py) — no live client in this
        environment to cross-verify, as with every other API here."""
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=True)
        group_ids = [
            r.compact_string() or "" for _ in range(max(r.compact_array_len(), 0))
        ]
        include_authz = r.bool_()
        r.tagged_fields()

        def wr_assignment(owned: dict[str, tuple[int, ...]]) -> None:
            w.compact_array_len(len(owned))
            for topic in sorted(owned):
                w.uuid(wire.topic_uuid(topic))
                w.compact_string(topic)
                parts = owned[topic]
                w.compact_array_len(len(parts))
                for p in parts:
                    w.int32(p)
                w.empty_tagged_fields()
            w.empty_tagged_fields()  # assignment struct

        w = wire.Writer()
        w.int32(h.correlation_id)
        w.empty_tagged_fields()  # response header v1
        w.int32(0)  # throttle_time_ms
        w.compact_array_len(len(group_ids))
        for gid in group_ids:
            g = self.groups.get(gid)
            if g is None:
                w.int16(ERR_GROUP_ID_NOT_FOUND)
                w.compact_string(f"group {gid!r} not found")
                w.compact_string(gid)
                w.compact_string("Dead")
                w.int32(0)  # group_epoch
                w.int32(0)  # assignment_epoch
                w.compact_string("")  # assignor_name
                w.compact_array_len(0)  # members
                w.int32(0 if include_authz else -2147483648)
                w.empty_tagged_fields()
                continue
            w.int16(wire.ERR_NONE)
            w.compact_string(None)  # error_message
            w.compact_string(gid)
            w.compact_string(self._group_state(g))
            w.int32(g.group_epoch)
            # assignment_epoch: the group epoch whose target every
            # member has reached — min over members, the epoch of the
            # assignment currently in force
            w.int32(
                min((m.member_epoch for m in g.members.values()), default=g.group_epoch)
            )
            w.compact_string(g.assignor or SUPPORTED_ASSIGNORS[0])
            w.compact_array_len(len(g.members))
            for mid in sorted(g.members):
                m = g.members[mid]
                w.compact_string(mid)
                w.compact_string(m.instance_id)
                w.compact_string(m.rack)
                w.int32(m.member_epoch)
                w.compact_string("")  # client_id (not tracked)
                w.compact_string("")  # client_host
                w.compact_array_len(len(m.subscriptions))
                for t in m.subscriptions:
                    w.compact_string(t)
                w.compact_string(m.regex)
                wr_assignment(m.current)  # confirmed ownership
                wr_assignment(m.target)  # server-side target
                if h.api_version >= 1:
                    w.int8(1)  # MemberType: 1 = KIP-848 consumer member
                w.empty_tagged_fields()
            w.int32(0 if include_authz else -2147483648)
            w.empty_tagged_fields()
        w.empty_tagged_fields()
        return w.bytes()

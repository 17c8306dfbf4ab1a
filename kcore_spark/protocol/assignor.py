"""Consumer-group partition assignors: range + roundrobin, with the
public `ConsumerProtocolSubscription` / `ConsumerProtocolAssignment`
v0 codecs they ride on.

Completes the reference's Consumer API roadmap row
(`/root/reference/README.md:48`). In Kafka the assignor runs in the
LEADER CONSUMER: JoinGroup carries each member's subscription bytes,
the broker hands the full map to the leader, the leader answers
SyncGroup with member→assignment bytes. This module provides both
halves — the codecs for clients and the assignment functions — and
`coordinator.Coordinator` also uses them as a server-side fallback
when a leader syncs without providing assignments (the convenience
path our own TopicConsumer uses).

Semantics match the upstream assignors:
- range: per topic, consumers sorted by member id; partition count n_p
  over n_c subscribers → first (n_p % n_c) consumers get
  ceil(n_p/n_c) consecutive partitions, the rest get floor.
- roundrobin: all (topic, partition) pairs in sorted order dealt one
  at a time to the next subscribed member in a circular member list.
"""

from __future__ import annotations

from kcore_spark.protocol import wire

# -------------------------------------------- consumer protocol codecs


def encode_subscription(topics: list[str], user_data: bytes | None = None) -> bytes:
    """ConsumerProtocolSubscription v0 (the JoinGroup metadata bytes)."""
    w = wire.Writer()
    w.int16(0)  # version
    w.int32(len(topics))
    for t in topics:
        w.nullable_string(t)
    w.nullable_bytes(user_data)
    return w.bytes()


def decode_subscription(buf: bytes) -> list[str]:
    r = wire.Reader(buf)
    r.int16()  # version (v1+ adds owned_partitions after user_data; we
    # only need topics, which sit first in every version)
    topics = [r.nullable_string() or "" for _ in range(r.int32())]
    return topics


def encode_assignment(
    partitions: dict[str, list[int]], user_data: bytes | None = None
) -> bytes:
    """ConsumerProtocolAssignment v0 (the SyncGroup assignment bytes)."""
    w = wire.Writer()
    w.int16(0)  # version
    w.int32(len(partitions))
    for topic in sorted(partitions):
        w.nullable_string(topic)
        parts = partitions[topic]
        w.int32(len(parts))
        for p in parts:
            w.int32(p)
    w.nullable_bytes(user_data)
    return w.bytes()


def decode_assignment(buf: bytes) -> dict[str, list[int]]:
    r = wire.Reader(buf)
    r.int16()  # version
    out: dict[str, list[int]] = {}
    for _ in range(r.int32()):
        topic = r.nullable_string() or ""
        out[topic] = [r.int32() for _ in range(r.int32())]
    return out


# -------------------------------------------- assignment strategies


def range_assign(
    subscriptions: dict[str, list[str]], partitions: dict[str, int]
) -> dict[str, dict[str, list[int]]]:
    """subscriptions: member → topics; partitions: topic → count.
    Returns member → topic → sorted partition list."""
    out: dict[str, dict[str, list[int]]] = {m: {} for m in subscriptions}
    for topic, n_parts in sorted(partitions.items()):
        members = sorted(m for m, ts in subscriptions.items() if topic in ts)
        if not members:
            continue
        base, extra = divmod(n_parts, len(members))
        start = 0
        for i, m in enumerate(members):
            take = base + (1 if i < extra else 0)
            if take:
                out[m][topic] = list(range(start, start + take))
            start += take
    return out


def roundrobin_assign(
    subscriptions: dict[str, list[str]], partitions: dict[str, int]
) -> dict[str, dict[str, list[int]]]:
    out: dict[str, dict[str, list[int]]] = {m: {} for m in subscriptions}
    members = sorted(subscriptions)
    if not members:
        return out
    all_parts = [
        (topic, p) for topic in sorted(partitions) for p in range(partitions[topic])
    ]
    i = 0
    for topic, p in all_parts:
        # advance to the next member subscribed to this topic (skipping
        # unsubscribed members, as the upstream RoundRobinAssignor does)
        for _ in range(len(members)):
            m = members[i % len(members)]
            i += 1
            if topic in subscriptions[m]:
                out[m].setdefault(topic, []).append(p)
                break
    return out


ASSIGNORS = {"range": range_assign, "roundrobin": roundrobin_assign}


def assign(
    strategy: str,
    subscriptions_bytes: dict[str, bytes],
    partitions: dict[str, int],
) -> dict[str, bytes]:
    """Decode member subscriptions, run the named strategy, encode
    per-member assignment bytes. Raises KeyError on unknown strategy."""
    subs = {m: decode_subscription(b) for m, b in subscriptions_bytes.items()}
    assigned = ASSIGNORS[strategy](subs, partitions)
    return {m: encode_assignment(tp) for m, tp in assigned.items()}

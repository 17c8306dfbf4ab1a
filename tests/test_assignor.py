"""Consumer-group assignors (VERDICT r1 #5): range/roundrobin
strategies, consumer-protocol codecs, the coordinator's server-side
fallback, and group-balanced TopicConsumer consumption."""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.protocol import wire
from kcore_spark.protocol.assignor import (
    decode_assignment,
    decode_subscription,
    encode_assignment,
    encode_subscription,
    range_assign,
    roundrobin_assign,
)
from kcore_spark.protocol.server import KafkaFrontend

# ------------------------------------------------------ codecs


def test_subscription_roundtrip():
    b = encode_subscription(["orders", "events"], user_data=b"ud")
    assert decode_subscription(b) == ["orders", "events"]


def test_assignment_roundtrip():
    tp = {"orders": [0, 1, 2], "events": [5]}
    assert decode_assignment(encode_assignment(tp)) == tp


# ------------------------------------------------------ strategies


def test_range_matches_kafka_semantics():
    # 5 partitions over 2 consumers: first gets 3 consecutive, second 2
    got = range_assign({"a": ["t"], "b": ["t"]}, {"t": 5})
    assert got == {"a": {"t": [0, 1, 2]}, "b": {"t": [3, 4]}}


def test_range_multiple_topics_independent():
    got = range_assign({"a": ["t1", "t2"], "b": ["t1"]}, {"t1": 2, "t2": 2})
    assert got["a"] == {"t1": [0], "t2": [0, 1]}
    assert got["b"] == {"t1": [1]}


def test_roundrobin_interleaves():
    got = roundrobin_assign({"a": ["t"], "b": ["t"]}, {"t": 5})
    assert got == {"a": {"t": [0, 2, 4]}, "b": {"t": [1, 3]}}


def test_roundrobin_skips_unsubscribed():
    got = roundrobin_assign({"a": ["t1", "t2"], "b": ["t2"]}, {"t1": 2, "t2": 2})
    # t1 only 'a' subscribes; t2 dealt in circular order continuing
    assert got["a"]["t1"] == [0, 1]
    assert sorted(got["a"].get("t2", []) + got["b"].get("t2", [])) == [0, 1]
    assert got["b"]["t2"]  # b got at least one t2 partition


@given(
    n_members=st.integers(min_value=1, max_value=8),
    n_parts=st.integers(min_value=0, max_value=32),
    strategy=st.sampled_from(["range", "roundrobin"]),
)
@settings(max_examples=200, deadline=None)
def test_assignment_is_disjoint_and_covering(n_members, n_parts, strategy):
    from kcore_spark.protocol.assignor import ASSIGNORS

    subs = {f"m{i}": ["t"] for i in range(n_members)}
    got = ASSIGNORS[strategy](subs, {"t": n_parts})
    all_parts = [p for tp in got.values() for p in tp.get("t", [])]
    assert sorted(all_parts) == list(range(n_parts))  # disjoint + covering
    counts = sorted(len(tp.get("t", [])) for tp in got.values())
    assert counts[-1] - counts[0] <= 1  # balanced within 1


# ------------------------------------------------------ wire fallback


def _join_payload(group, member_id, topics, corr=31):
    w = wire.Writer()
    w.int16(wire.JOIN_GROUP_KEY).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.nullable_string(group)
    w.int32(30000)
    w.nullable_string(member_id)
    w.nullable_string("consumer")
    w.int32(1)
    w.nullable_string("range")
    w.nullable_bytes(encode_subscription(topics))
    return w.bytes()


def _sync_payload(group, generation, member_id, corr=32):
    w = wire.Writer()
    w.int16(wire.SYNC_GROUP_KEY).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.nullable_string(group)
    w.int32(generation)
    w.nullable_string(member_id)
    w.int32(0)  # leader provides NO assignments → server-side fallback
    return w.bytes()


def _parse_join(resp):
    r = wire.Reader(resp)
    r.int32()
    err = r.int16()
    gen = r.int32()
    r.nullable_string()  # protocol
    leader = r.nullable_string()
    member = r.nullable_string()
    n = r.int32()
    for _ in range(n):
        r.nullable_string(), r.nullable_bytes()
    return err, gen, leader, member


def _parse_sync(resp):
    r = wire.Reader(resp)
    r.int32()
    err = r.int16()
    return err, r.nullable_bytes()


def test_two_members_get_disjoint_covering_ranges():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 4)
    err, g1, leader, m1 = _parse_join(fe.handle_request(_join_payload("grp", "", ["t"])))
    assert err == wire.ERR_NONE
    err, g2, leader, m2 = _parse_join(fe.handle_request(_join_payload("grp", "", ["t"])))
    assert err == wire.ERR_NONE and m2 != m1
    # leader re-joins at the new generation (normal rebalance flow)
    err, gen, leader, _ = _parse_join(fe.handle_request(_join_payload("grp", m1, ["t"])))
    assert leader == m1
    err, a1 = _parse_sync(fe.handle_request(_sync_payload("grp", gen, m1)))
    assert err == wire.ERR_NONE
    err, a2 = _parse_sync(fe.handle_request(_sync_payload("grp", gen, m2)))
    assert err == wire.ERR_NONE
    p1 = decode_assignment(a1)["t"]
    p2 = decode_assignment(a2)["t"]
    assert p1 == [0, 1] and p2 == [2, 3]  # Kafka range semantics


# ------------------------------------------------------ consumer split


def test_balanced_consumers_cover_topic_disjointly(spark):
    from pyspark.sql import functions as F

    from kcore_spark.sources.consumer import balanced_consumers
    from kcore_spark.sources.topic_log import TopicLog

    with tempfile.TemporaryDirectory(prefix="kcore_topics_") as d:
        log = TopicLog(spark, d)
        log.create_topic("t", 4)
        recs = spark.range(40).select(
            F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
            F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
            F.col("id").alias("seq"),
        )
        log.produce("t", recs, order_by=["seq"])
        consumers = balanced_consumers(log, "g", "t", 2)
        assert sorted(p for c in consumers for p in c.partitions) == [0, 1, 2, 3]
        seen = []
        for c in consumers:
            df = c.poll(max_records_per_partition=100)
            seen += [r.value for r in df.collect()]
        assert len(seen) == 40 and len(set(seen)) == 40  # disjoint + complete

"""Consumer-group protocol: commit→fetch round-trip, coordinator
discovery, and the durable sync into the parquet offsets store."""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.groups import GroupStore
from kcore_spark.protocol.server import KafkaFrontend


def _commit_payload(group: str, topic: str, commits: list[tuple[int, int]], corr=21) -> bytes:
    w = wire.Writer()
    w.int16(wire.OFFSET_COMMIT_KEY).int16(2).int32(corr)
    w.nullable_string("c")
    w.nullable_string(group)
    w.int32(-1)  # generation
    w.nullable_string("member-1")
    w.int64(-1)  # retention
    w.int32(1)
    w.nullable_string(topic)
    w.int32(len(commits))
    for p, off in commits:
        w.int32(p).int64(off)
        w.nullable_string(None)
    return w.bytes()


def _fetch_payload(group: str, topic: str, parts: list[int], corr=22) -> bytes:
    w = wire.Writer()
    w.int16(wire.OFFSET_FETCH_KEY).int16(1).int32(corr)
    w.nullable_string("c")
    w.nullable_string(group)
    w.int32(1)
    w.nullable_string(topic)
    w.int32(len(parts))
    for p in parts:
        w.int32(p)
    return w.bytes()


def test_commit_then_fetch_roundtrip():
    fe = KafkaFrontend()
    resp = fe.handle_request(_commit_payload("g1", "t", [(0, 10), (1, 20)]))
    r = wire.Reader(resp)
    assert r.int32() == 21
    assert r.int32() == 1
    assert r.nullable_string() == "t"
    assert r.int32() == 2
    assert (r.int32(), r.int16()) == (0, 0)
    assert (r.int32(), r.int16()) == (1, 0)

    # overwrite partition 0, then fetch all three (2 committed, 1 not)
    fe.handle_request(_commit_payload("g1", "t", [(0, 15)]))
    resp = fe.handle_request(_fetch_payload("g1", "t", [0, 1, 2]))
    r = wire.Reader(resp)
    assert r.int32() == 22
    r.int32(), r.nullable_string(), r.int32()
    got = {}
    for _ in range(3):
        p = r.int32()
        off = r.int64()
        r.nullable_string()
        err = r.int16()
        got[p] = (off, err)
    assert got == {0: (15, 0), 1: (20, 0), 2: (-1, 0)}


def test_group_isolation():
    fe = KafkaFrontend()
    fe.handle_request(_commit_payload("g1", "t", [(0, 5)]))
    resp = fe.handle_request(_fetch_payload("g2", "t", [0]))
    r = wire.Reader(resp)
    r.int32(), r.int32(), r.nullable_string(), r.int32()
    assert (r.int32(), r.int64()) == (0, -1)  # g2 sees nothing


def test_find_coordinator():
    fe = KafkaFrontend(host="127.0.0.1", port=9092)
    w = wire.Writer()
    w.int16(wire.FIND_COORDINATOR_KEY).int16(0).int32(31)
    w.nullable_string("c")
    w.nullable_string("g1")
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 31
    assert r.int16() == 0
    assert r.int32() == 0
    assert r.nullable_string() == "127.0.0.1"
    assert r.int32() == 9092


def test_sync_to_durable_offsets(spark, tmp_path):
    from kcore_spark.sources.topic_log import TopicLog

    tlog = TopicLog(spark, str(tmp_path))
    tlog.create_topic("t", 2)
    store = GroupStore()
    store.commit("g1", "t", 0, 100)
    store.commit("g1", "t", 1, 200)
    assert store.sync_to_topic_log(tlog) == 2
    rows = {r["partition"]: r["committed_offset"] for r in tlog.fetch_offsets("g1").collect()}
    assert rows == {0: 100, 1: 200}

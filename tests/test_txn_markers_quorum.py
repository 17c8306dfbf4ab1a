"""WriteTxnMarkers k27 (hanging-transaction abort path over the real
txn machinery) and DescribeQuorum k55 (single-voter metadata quorum)."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    ERR_INVALID_PRODUCER_EPOCH,
    Record,
)
from kcore_spark.protocol.server import KafkaFrontend

CORR = 27055


def _hdr(key: int, version: int, flex: bool) -> wire.Writer:
    w = wire.Writer()
    w.int16(key).int16(version).int32(CORR)
    w.nullable_string("t")
    if flex:
        w.empty_tagged_fields()
    return w


def _markers_req(v: int, markers) -> bytes:
    flex = v >= 1
    w = _hdr(wire.WRITE_TXN_MARKERS_KEY, v, flex)
    (w.compact_array_len if flex else w.int32)(len(markers))
    for pid, epoch, commit, topics in markers:
        w.int64(pid)
        w.int16(epoch)
        w.bool_(commit)
        (w.compact_array_len if flex else w.int32)(len(topics))
        for name, parts in topics:
            (w.compact_string if flex else w.nullable_string)(name)
            (w.compact_array_len if flex else w.int32)(len(parts))
            for p in parts:
                w.int32(p)
            if flex:
                w.empty_tagged_fields()
        w.int32(0)  # coordinator_epoch
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def _parse_markers(resp: bytes, v: int):
    flex = v >= 1
    r = wire.Reader(resp)
    assert r.int32() == CORR
    if flex:
        r.tagged_fields()
    out = []
    for _ in range(max((r.compact_array_len() if flex else r.int32()), 0)):
        pid = r.int64()
        for _ in range(max((r.compact_array_len() if flex else r.int32()), 0)):
            name = r.compact_string() if flex else r.nullable_string()
            for _ in range(max((r.compact_array_len() if flex else r.int32()), 0)):
                p = r.int32()
                e = r.int16()
                out.append((pid, name, p, e))
                if flex:
                    r.tagged_fields()
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()
    return out


@pytest.mark.parametrize("v", [0, 1])
def test_abort_marker_kills_hanging_txn(v):
    """A transactional produce left open (the 'hanging' case): the
    abort marker completes it and read_committed never sees the rows."""
    fe = KafkaFrontend()
    log = fe.wire_log
    log.create_topic("tx", 1)
    pid, epoch = log.init_producer_id("hang-tid")
    assert log.add_partition_to_txn(pid, epoch, "tx", 0) == wire.ERR_NONE
    base = log.append("tx", 0, [Record(key=None, value=b"dirty", timestamp_ms=1)])
    log.note_transactional_append("tx", 0, pid, base)
    assert log.read_committed("tx", 0, 0, 100) == []  # below LSO: invisible

    rows = _parse_markers(
        fe.handle_request(_markers_req(v, [(pid, epoch, False, [("tx", [0])])])), v
    )
    assert rows == [(pid, "tx", 0, wire.ERR_NONE)]
    # txn closed: the aborted range is filtered forever
    assert log.read_committed("tx", 0, 0, 100) == []
    assert log.last_stable_offset("tx", 0) == log.high_watermark("tx", 0)
    # marker re-delivery is idempotent
    rows2 = _parse_markers(
        fe.handle_request(_markers_req(v, [(pid, epoch, False, [("tx", [0])])])), v
    )
    assert rows2 == [(pid, "tx", 0, wire.ERR_NONE)]


def test_commit_marker_and_error_paths():
    fe = KafkaFrontend()
    log = fe.wire_log
    log.create_topic("tx", 1)
    pid, epoch = log.init_producer_id("tid-c")
    log.add_partition_to_txn(pid, epoch, "tx", 0)
    base = log.append("tx", 0, [Record(key=None, value=b"good", timestamp_ms=1)])
    log.note_transactional_append("tx", 0, pid, base)
    rows = _parse_markers(
        fe.handle_request(_markers_req(1, [(pid, epoch, True, [("tx", [0])])])), 1
    )
    assert rows == [(pid, "tx", 0, wire.ERR_NONE)]
    assert [r.value for r in log.read_committed("tx", 0, 0, 100)] == [b"good"]
    # stale epoch
    rows2 = _parse_markers(
        fe.handle_request(_markers_req(1, [(pid, epoch + 9, False, [("tx", [0])])])), 1
    )
    assert rows2 == [(pid, "tx", 0, ERR_INVALID_PRODUCER_EPOCH)]
    # unknown partition inside a valid marker
    pid2, epoch2 = log.init_producer_id("tid-d")
    log.add_partition_to_txn(pid2, epoch2, "tx", 0)
    rows3 = _parse_markers(
        fe.handle_request(
            _markers_req(1, [(pid2, epoch2, False, [("tx", [0]), ("nope", [3])])])
        ),
        1,
    )
    assert (pid2, "tx", 0, wire.ERR_NONE) in rows3
    assert (pid2, "nope", 3, wire.ERR_UNKNOWN_TOPIC_OR_PARTITION) in rows3


def test_commit_marker_applies_staged_offsets():
    """Completing a transaction via WriteTxnMarkers must apply the
    offsets staged through TxnOffsetCommit exactly as EndTxn does —
    otherwise the two completion paths break EOS commit atomicity
    (ADVICE r8). Abort markers must discard them."""
    fe = KafkaFrontend()
    log = fe.wire_log
    log.create_topic("tx", 1)
    pid, epoch = log.init_producer_id("tid-off")
    log.add_partition_to_txn(pid, epoch, "tx", 0)
    assert log.add_offsets_to_txn(pid, epoch, "g1") == wire.ERR_NONE
    assert log.txn_offset_commit(pid, epoch, "g1", "tx", 0, 42) == wire.ERR_NONE
    rows = _parse_markers(
        fe.handle_request(_markers_req(1, [(pid, epoch, True, [("tx", [0])])])), 1
    )
    assert rows == [(pid, "tx", 0, wire.ERR_NONE)]
    assert fe.group_store.committed("g1") == {("tx", 0): 42}
    # abort path: staged offsets die with the txn
    pid2, epoch2 = log.init_producer_id("tid-off2")
    log.add_partition_to_txn(pid2, epoch2, "tx", 0)
    log.add_offsets_to_txn(pid2, epoch2, "g2")
    log.txn_offset_commit(pid2, epoch2, "g2", "tx", 0, 7)
    fe.handle_request(_markers_req(1, [(pid2, epoch2, False, [("tx", [0])])]))
    assert fe.group_store.committed("g2") == {}


# ------------------------------------------------- DescribeQuorum


def _quorum_req(v: int, topic: str, partition: int) -> bytes:
    w = _hdr(wire.DESCRIBE_QUORUM_KEY, v, True)
    w.compact_array_len(1)
    w.compact_string(topic)
    w.compact_array_len(1)
    w.int32(partition)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _parse_quorum(resp: bytes, v: int):
    r = wire.Reader(resp)
    assert r.int32() == CORR
    r.tagged_fields()
    top_err = r.int16()
    out = []
    for _ in range(max(r.compact_array_len(), 0)):
        name = r.compact_string()
        for _ in range(max(r.compact_array_len(), 0)):
            part = {"topic": name, "partition": r.int32(), "error": r.int16(),
                    "leader_id": r.int32(), "leader_epoch": r.int32(),
                    "hwm": r.int64(), "voters": []}
            for _ in range(max(r.compact_array_len(), 0)):
                voter = {"replica_id": r.int32(), "leo": r.int64()}
                if v >= 1:
                    voter["last_fetch"] = r.int64()
                    voter["last_caught_up"] = r.int64()
                r.tagged_fields()
                part["voters"].append(voter)
            n_obs = r.compact_array_len()
            assert n_obs <= 0 or n_obs == 0
            r.tagged_fields()
            out.append(part)
        r.tagged_fields()
    return top_err, out


@pytest.mark.parametrize("v", [0, 1])
def test_describe_quorum_single_voter(v):
    fe = KafkaFrontend()
    err, parts = _parse_quorum(
        fe.handle_request(_quorum_req(v, "__cluster_metadata", 0)), v
    )
    assert err == wire.ERR_NONE
    p = parts[0]
    assert p["error"] == wire.ERR_NONE and p["leader_id"] == 0
    assert len(p["voters"]) == 1 and p["voters"][0]["replica_id"] == 0
    if v >= 1:
        assert p["voters"][0]["last_fetch"] >= p["voters"][0]["last_caught_up"] - 1


def test_describe_quorum_unknown_topic():
    fe = KafkaFrontend()
    err, parts = _parse_quorum(fe.handle_request(_quorum_req(1, "user-topic", 0)), 1)
    assert err == wire.ERR_NONE
    assert parts[0]["error"] == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    assert parts[0]["leader_id"] == -1 and parts[0]["voters"] == []

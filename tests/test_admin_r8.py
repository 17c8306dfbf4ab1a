"""Round-8 admin-plane additions: ElectLeaders k43 (single-replica
ELECTION_NOT_NEEDED contract), partition reassignments k45/k46
(no-op [0] / invalid target / cancel-with-none-in-progress / empty
active list), and UpdateFeatures k57 (KIP-584 level moves, downgrade
gating, atomic batch, validate_only)."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.admin import (
    ERR_ELECTION_NOT_NEEDED,
    ERR_INVALID_REPLICA_ASSIGNMENT,
    ERR_INVALID_UPDATE_VERSION,
    ERR_NO_REASSIGNMENT_IN_PROGRESS,
    ERR_UNKNOWN_TOPIC_OR_PARTITION,
)
from kcore_spark.protocol.server import KafkaFrontend

CORR = 424242


def _fe() -> KafkaFrontend:
    fe = KafkaFrontend()
    fe.wire_log.create_topic("adm", 2)
    return fe


def _hdr(key: int, version: int, flex: bool) -> wire.Writer:
    w = wire.Writer()
    w.int16(key).int16(version).int32(CORR)
    w.nullable_string("t")
    if flex:
        w.empty_tagged_fields()
    return w


# ----------------------------------------------------- ElectLeaders


def _elect_req(v: int, topics) -> bytes:
    flex = v >= 2
    w = _hdr(wire.ELECT_LEADERS_KEY, v, flex)
    if v >= 1:
        w.int8(0)
    if topics is None:
        (w.compact_array_len if flex else w.int32)(-1)
    else:
        (w.compact_array_len if flex else w.int32)(len(topics))
        for name, pids in topics:
            (w.compact_string if flex else w.nullable_string)(name)
            (w.compact_array_len if flex else w.int32)(len(pids))
            for p in pids:
                w.int32(p)
            if flex:
                w.empty_tagged_fields()
    w.int32(5000)
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def _parse_elect(resp: bytes, v: int):
    flex = v >= 2
    r = wire.Reader(resp)
    assert r.int32() == CORR
    if flex:
        r.tagged_fields()
    r.int32()  # throttle
    top_err = r.int16() if v >= 1 else 0
    out = []
    for _ in range(max((r.compact_array_len() if flex else r.int32()), 0)):
        name = r.compact_string() if flex else r.nullable_string()
        for _ in range(max((r.compact_array_len() if flex else r.int32()), 0)):
            pid = r.int32()
            err = r.int16()
            msg = r.compact_string() if flex else r.nullable_string()
            out.append((name, pid, err, msg))
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()
    return top_err, out


@pytest.mark.parametrize("v", [0, 2])
def test_elect_leaders_not_needed_on_single_replica(v):
    fe = _fe()
    top_err, rows = _parse_elect(
        fe.handle_request(_elect_req(v, [("adm", [0, 1]), ("nope", [0])])), v
    )
    assert top_err == 0
    by = {(t, p): e for t, p, e, _m in rows}
    assert by[("adm", 0)] == ERR_ELECTION_NOT_NEEDED
    assert by[("adm", 1)] == ERR_ELECTION_NOT_NEEDED
    assert by[("nope", 0)] == ERR_UNKNOWN_TOPIC_OR_PARTITION


def test_elect_leaders_null_topics_reports_nothing():
    fe = _fe()
    top_err, rows = _parse_elect(fe.handle_request(_elect_req(2, None)), 2)
    assert top_err == 0 and rows == []


# ----------------------------------------------- reassignments k45


def _alter_reassign_req(parts) -> bytes:
    w = _hdr(wire.ALTER_PARTITION_REASSIGNMENTS_KEY, 0, True)
    w.int32(5000)
    w.compact_array_len(len(parts))
    for name, pid, replicas in parts:
        w.compact_string(name)
        w.compact_array_len(1)
        w.int32(pid)
        if replicas is None:
            w.compact_array_len(-1)
        else:
            w.compact_array_len(len(replicas))
            for rep in replicas:
                w.int32(rep)
        w.empty_tagged_fields()
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _parse_reassign(resp: bytes):
    r = wire.Reader(resp)
    assert r.int32() == CORR
    r.tagged_fields()
    r.int32()  # throttle
    top_err = r.int16()
    r.compact_string()  # error_message
    out = []
    for _ in range(max(r.compact_array_len(), 0)):
        name = r.compact_string()
        for _ in range(max(r.compact_array_len(), 0)):
            pid = r.int32()
            err = r.int16()
            r.compact_string()
            out.append((name, pid, err))
            r.tagged_fields()
        r.tagged_fields()
    return top_err, out


def test_alter_reassignments_error_lattice():
    fe = _fe()
    top_err, rows = _parse_reassign(
        fe.handle_request(
            _alter_reassign_req(
                [
                    ("adm", 0, [0]),       # no-op to the only replica
                    ("adm", 1, [0, 1]),    # impossible target
                    ("adm", 0, None),      # cancel with nothing running
                    ("nope", 0, [0]),      # unknown
                ]
            )
        )
    )
    assert top_err == 0
    errs = [e for _t, _p, e in rows]
    assert errs == [
        wire.ERR_NONE,
        ERR_INVALID_REPLICA_ASSIGNMENT,
        ERR_NO_REASSIGNMENT_IN_PROGRESS,
        ERR_UNKNOWN_TOPIC_OR_PARTITION,
    ]


def test_list_reassignments_always_empty():
    fe = _fe()
    w = _hdr(wire.LIST_PARTITION_REASSIGNMENTS_KEY, 0, True)
    w.int32(5000)
    w.compact_array_len(-1)
    w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == CORR
    r.tagged_fields()
    r.int32()
    assert r.int16() == wire.ERR_NONE
    r.compact_string()
    assert r.compact_array_len() == 0


# -------------------------------------------------- UpdateFeatures


def _update_req(v: int, updates, validate_only=False) -> bytes:
    w = _hdr(wire.UPDATE_FEATURES_KEY, v, True)
    w.int32(5000)
    w.compact_array_len(len(updates))
    for feature, level, downgrade in updates:
        w.compact_string(feature)
        w.int16(level)
        if v == 0:
            w.bool_(downgrade)
        else:
            w.int8(2 if downgrade else 1)
        w.empty_tagged_fields()
    if v >= 1:
        w.bool_(validate_only)
    w.empty_tagged_fields()
    return w.bytes()


def _parse_update(resp: bytes):
    r = wire.Reader(resp)
    assert r.int32() == CORR
    r.tagged_fields()
    r.int32()
    top_err = r.int16()
    r.compact_string()
    out = []
    for _ in range(max(r.compact_array_len(), 0)):
        f = r.compact_string()
        e = r.int16()
        r.compact_string()
        out.append((f, e))
        r.tagged_fields()
    return top_err, out


def test_update_features_upgrade_and_downgrade_gate():
    fe = _fe()
    assert fe.feature_levels["metadata.version"] == 1
    top, res = _parse_update(
        fe.handle_request(_update_req(1, [("metadata.version", 7, False)]))
    )
    assert top == wire.ERR_NONE and res == [("metadata.version", 0)]
    assert fe.feature_levels["metadata.version"] == 7
    # downgrade without the flag: refused, level unchanged
    top, res = _parse_update(
        fe.handle_request(_update_req(1, [("metadata.version", 3, False)]))
    )
    assert top == ERR_INVALID_UPDATE_VERSION
    assert fe.feature_levels["metadata.version"] == 7
    # with the downgrade flag: applied
    top, _ = _parse_update(
        fe.handle_request(_update_req(1, [("metadata.version", 3, True)]))
    )
    assert top == wire.ERR_NONE and fe.feature_levels["metadata.version"] == 3


def test_update_features_atomic_batch_and_validate_only():
    fe = _fe()
    # one bad update (unknown feature) fails the whole batch
    top, res = _parse_update(
        fe.handle_request(
            _update_req(1, [("metadata.version", 5, False), ("bogus.feature", 1, False)])
        )
    )
    assert top == ERR_INVALID_UPDATE_VERSION
    assert dict(res)["metadata.version"] == wire.ERR_NONE
    assert dict(res)["bogus.feature"] == ERR_INVALID_UPDATE_VERSION
    assert fe.feature_levels["metadata.version"] == 1  # untouched
    # validate_only: all-green but no mutation
    top, _ = _parse_update(
        fe.handle_request(_update_req(1, [("metadata.version", 5, False)], validate_only=True))
    )
    assert top == wire.ERR_NONE
    assert fe.feature_levels["metadata.version"] == 1
    # v0 allow_downgrade flag form works too
    top, _ = _parse_update(fe.handle_request(_update_req(0, [("metadata.version", 2, False)])))
    assert top == wire.ERR_NONE and fe.feature_levels["metadata.version"] == 2
    # out-of-range level
    top, _ = _parse_update(fe.handle_request(_update_req(1, [("metadata.version", 99, False)])))
    assert top == ERR_INVALID_UPDATE_VERSION

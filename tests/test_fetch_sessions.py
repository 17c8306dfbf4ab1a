"""KIP-227 incremental fetch sessions: establish (epoch 0), steady
state omits unchanged partitions, new data re-includes them, forgotten
topics shrink the interest set, and the error paths
(FETCH_SESSION_ID_NOT_FOUND / INVALID_FETCH_SESSION_EPOCH) drive the
full-fetch recovery contract."""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import (
    ERR_FETCH_SESSION_ID_NOT_FOUND,
    ERR_INVALID_FETCH_SESSION_EPOCH,
    Record,
    WireLog,
    handle_fetch,
)

V = 12  # flexible fetch


def _log():
    log = WireLog()
    log.create_topic("t", 2)
    log.append("t", 0, [Record(b"k", str(i).encode(), 100 + i) for i in range(5)])
    return log


def _fetch_req(session_id, epoch, topics, forgotten=(), corr=50):
    """topics: [(name, [(partition, fetch_offset)])]"""
    w = wire.Writer()
    w.int16(wire.FETCH_KEY).int16(V).int32(corr)
    w.nullable_string("pytest")
    w.empty_tagged_fields()  # header v2 (flexible)
    w.int32(-1)  # replica_id
    w.int32(100)  # max_wait
    w.int32(1)  # min_bytes
    w.int32(1 << 20)  # max_bytes
    w.int8(0)  # isolation
    w.int32(session_id)
    w.int32(epoch)
    w.compact_array_len(len(topics))
    for name, parts in topics:
        w.compact_string(name)
        w.compact_array_len(len(parts))
        for idx, off in parts:
            w.int32(idx)
            w.int32(-1)  # current_leader_epoch
            w.int64(off)
            w.int64(0)  # log_start_offset
            w.int32(1 << 20)  # partition max_bytes
            w.empty_tagged_fields()
        w.empty_tagged_fields()
    w.compact_array_len(len(forgotten))
    for name, parts in forgotten:
        w.compact_string(name)
        w.compact_array_len(len(parts))
        for idx in parts:
            w.int32(idx)
        w.empty_tagged_fields()
    w.compact_string(None)  # rack_id
    w.empty_tagged_fields()
    return w.bytes()


def _parse(resp):
    """→ (error_code, session_id, {(topic, partition): has_records})"""
    r = wire.Reader(resp)
    assert r.int32() == 50
    r.tagged_fields()
    r.int32()  # throttle
    err = r.int16()
    sid = r.int32()
    out = {}
    for _ in range(max(r.compact_array_len(), 0)):
        name = r.compact_string()
        for _ in range(max(r.compact_array_len(), 0)):
            idx = r.int32()
            r.int16()  # part err
            r.int64()  # hw
            r.int64()  # lso
            r.int64()  # log_start
            for _ in range(max(r.compact_array_len(), 0)):  # aborted txns
                r.int64()
                r.int64()
                r.tagged_fields()
            r.int32()  # preferred_read_replica
            batch = r.compact_bytes()
            r.tagged_fields()
            out[(name, idx)] = bool(batch)
        r.tagged_fields()
    r.tagged_fields()
    return err, sid, out


def test_session_establish_then_quiet_incremental_is_empty():
    log = _log()
    err, sid, parts = _parse(
        handle_fetch(log, _fetch_req(0, 0, [("t", [(0, 0), (1, 0)])]))
    )
    assert err == wire.ERR_NONE and sid > 0
    assert parts[("t", 0)] is True  # records delivered
    assert parts[("t", 1)] is False  # empty partition, hw reported
    # steady state: nothing changed, client consumed through offset 5
    err, sid2, parts = _parse(
        handle_fetch(log, _fetch_req(sid, 1, [("t", [(0, 5)])]))
    )
    assert err == wire.ERR_NONE and sid2 == sid
    assert parts == {}  # constant-size quiet fetch: all omitted


def test_new_data_reincludes_partition():
    log = _log()
    _, sid, _ = _parse(handle_fetch(log, _fetch_req(0, 0, [("t", [(0, 0), (1, 0)])])))
    _parse(handle_fetch(log, _fetch_req(sid, 1, [("t", [(0, 5)])])))  # drain
    log.append("t", 1, [Record(b"k", b"new", 200)])
    err, _, parts = _parse(handle_fetch(log, _fetch_req(sid, 2, [])))
    assert err == wire.ERR_NONE
    # only the partition with new data comes back
    assert parts == {("t", 1): True}


def test_forgotten_partition_leaves_session():
    log = _log()
    _, sid, _ = _parse(handle_fetch(log, _fetch_req(0, 0, [("t", [(0, 0), (1, 0)])])))
    _parse(handle_fetch(log, _fetch_req(sid, 1, [], forgotten=[("t", [0])])))
    log.append("t", 0, [Record(b"k", b"more", 300)])  # new data on forgotten part
    err, _, parts = _parse(handle_fetch(log, _fetch_req(sid, 2, [])))
    assert err == wire.ERR_NONE
    assert parts == {}  # partition 0 no longer in the interest set


def test_unknown_session_and_stale_epoch_errors():
    log = _log()
    err, sid, parts = _parse(handle_fetch(log, _fetch_req(9999, 1, [])))
    assert err == ERR_FETCH_SESSION_ID_NOT_FOUND and parts == {}
    _, sid, _ = _parse(handle_fetch(log, _fetch_req(0, 0, [("t", [(0, 0)])])))
    err, _, _ = _parse(handle_fetch(log, _fetch_req(sid, 7, [])))  # wrong epoch
    assert err == ERR_INVALID_FETCH_SESSION_EPOCH


def test_sessionless_minus_one_still_full_fetch():
    log = _log()
    err, sid, parts = _parse(
        handle_fetch(log, _fetch_req(0, -1, [("t", [(0, 0), (1, 0)])]))
    )
    assert err == wire.ERR_NONE and sid == 0
    assert set(parts) == {("t", 0), ("t", 1)}
    # no session allocated
    assert log.fetch_sessions.sessions == {}


def test_session_cache_evicts_oldest_at_cap():
    log = _log()
    log.fetch_sessions.max_sessions = 3
    sids = []
    for _ in range(4):
        _, sid, _ = _parse(handle_fetch(log, _fetch_req(0, 0, [("t", [(0, 0)])])))
        sids.append(sid)
    assert len(log.fetch_sessions.sessions) == 3
    err, _, _ = _parse(handle_fetch(log, _fetch_req(sids[0], 1, [])))
    assert err == ERR_FETCH_SESSION_ID_NOT_FOUND  # evicted → full-fetch retry

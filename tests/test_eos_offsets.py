"""Consume-transform-produce EOS pair: AddOffsetsToTxn (25) +
TxnOffsetCommit (28). Staged offsets are invisible to OffsetFetch
until EndTxn commits, aborts discard them, commit applies records AND
offsets atomically, fencing clears staged state, and the v3 flexible
encodings round-trip."""

from __future__ import annotations

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import ERR_INVALID_PRODUCER_EPOCH, ERR_INVALID_TXN_STATE
from kcore_spark.protocol.server import KafkaFrontend

from tests.test_transactions import _end_txn, _init_txn_pid


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("alpha", 2)
    return f


def _add_offsets(fe, tid, pid, epoch, group, version=0, corr=90):
    flex = version >= 3
    w = wire.Writer()
    w.int16(wire.ADD_OFFSETS_TO_TXN_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
        w.compact_string(tid)
    else:
        w.nullable_string(tid)
    w.int64(pid).int16(epoch)
    (w.compact_string if flex else w.nullable_string)(group)
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    if flex:
        r.tagged_fields()
    r.int32()  # throttle
    return r.int16()


def _txn_commit_offsets(fe, tid, pid, epoch, group, offsets, version=0, corr=91):
    """offsets: {(topic, partition): offset} → {(topic, partition): err}"""
    flex = version >= 3
    w = wire.Writer()
    w.int16(wire.TXN_OFFSET_COMMIT_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    if flex:
        w.empty_tagged_fields()
    wstr = w.compact_string if flex else w.nullable_string
    wlen = w.compact_array_len if flex else w.int32
    wstr(tid)
    wstr(group)
    w.int64(pid).int16(epoch)
    if version >= 3:
        w.int32(-1)  # generation_id
        w.compact_string("")  # member_id
        w.compact_string(None)  # group_instance_id
    by_topic: dict[str, list[tuple[int, int]]] = {}
    for (t, p), o in offsets.items():
        by_topic.setdefault(t, []).append((p, o))
    wlen(len(by_topic))
    for t, parts in sorted(by_topic.items()):
        wstr(t)
        wlen(len(parts))
        for p, o in parts:
            w.int32(p).int64(o)
            if version >= 2:
                w.int32(-1)  # committed_leader_epoch
            wstr(None)  # metadata
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    if flex:
        r.tagged_fields()
    r.int32()  # throttle
    out = {}
    rlen = r.compact_array_len if flex else r.int32
    rstr = r.compact_string if flex else r.nullable_string
    for _ in range(max(rlen(), 0)):
        name = rstr()
        for _ in range(max(rlen(), 0)):
            p = r.int32()
            out[(name, p)] = r.int16()
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()
    return out


@pytest.mark.parametrize("version", [0, 2, 3])
def test_eos_offsets_apply_only_on_commit(fe, version):
    pid, epoch = _init_txn_pid(fe, "eos-1")
    assert _add_offsets(fe, "eos-1", pid, epoch, "g1", version=version) == wire.ERR_NONE
    errs = _txn_commit_offsets(
        fe, "eos-1", pid, epoch, "g1", {("alpha", 0): 42, ("alpha", 1): 7}, version=version
    )
    assert set(errs.values()) == {wire.ERR_NONE}
    # staged, NOT applied: OffsetFetch must not see them yet
    assert fe.group_store.fetch("g1", "alpha", 0) == -1
    _end_txn(fe, "eos-1", pid, epoch, commit=True)
    assert fe.group_store.fetch("g1", "alpha", 0) == 42
    assert fe.group_store.fetch("g1", "alpha", 1) == 7


def test_eos_offsets_discarded_on_abort(fe):
    pid, epoch = _init_txn_pid(fe, "eos-2")
    assert _add_offsets(fe, "eos-2", pid, epoch, "g2") == wire.ERR_NONE
    _txn_commit_offsets(fe, "eos-2", pid, epoch, "g2", {("alpha", 0): 99})
    _end_txn(fe, "eos-2", pid, epoch, commit=False)
    assert fe.group_store.fetch("g2", "alpha", 0) == -1
    # the txn is closed: a fresh cycle works
    assert _add_offsets(fe, "eos-2", pid, epoch, "g2") == wire.ERR_NONE


def test_txn_offset_commit_requires_add_offsets_first(fe):
    pid, epoch = _init_txn_pid(fe, "eos-3")
    errs = _txn_commit_offsets(fe, "eos-3", pid, epoch, "g3", {("alpha", 0): 5})
    assert errs[("alpha", 0)] == ERR_INVALID_TXN_STATE


def test_eos_fencing_drops_staged_offsets(fe):
    pid, epoch = _init_txn_pid(fe, "eos-4")
    _add_offsets(fe, "eos-4", pid, epoch, "g4")
    _txn_commit_offsets(fe, "eos-4", pid, epoch, "g4", {("alpha", 0): 11})
    # a new instance of the same transactional id fences the old one
    pid2, epoch2 = _init_txn_pid(fe, "eos-4")
    assert (pid2, epoch2) == (pid, epoch + 1)
    # the zombie's stale epoch is rejected everywhere
    assert _add_offsets(fe, "eos-4", pid, epoch, "g4") == ERR_INVALID_PRODUCER_EPOCH
    errs = _txn_commit_offsets(fe, "eos-4", pid, epoch, "g4", {("alpha", 0): 12})
    assert errs[("alpha", 0)] == ERR_INVALID_PRODUCER_EPOCH
    # the fenced txn's staged offsets never apply, even after the new
    # instance commits its own (empty) transaction
    _add_offsets(fe, "eos-4", pid2, epoch2, "g4")
    _end_txn(fe, "eos-4", pid2, epoch2, commit=True)
    assert fe.group_store.fetch("g4", "alpha", 0) == -1


def test_offsets_only_transaction_is_legal(fe):
    """A transaction that commits offsets but produces nothing (a
    filter job that consumed and dropped everything) must still
    commit cleanly."""
    pid, epoch = _init_txn_pid(fe, "eos-5")
    assert _add_offsets(fe, "eos-5", pid, epoch, "g5") == wire.ERR_NONE
    _txn_commit_offsets(fe, "eos-5", pid, epoch, "g5", {("alpha", 1): 3})
    _end_txn(fe, "eos-5", pid, epoch, commit=True)
    assert fe.group_store.fetch("g5", "alpha", 1) == 3


def test_apiversions_advertises_eos_pair():
    advertised = {k: (lo, hi) for k, lo, hi in wire.SUPPORTED_APIS}
    assert advertised[wire.ADD_OFFSETS_TO_TXN_KEY] == (0, 3)
    assert advertised[wire.TXN_OFFSET_COMMIT_KEY] == (0, 3)

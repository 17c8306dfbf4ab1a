"""KIP-405 / KIP-1005 tiered storage at the wire level.

The reference's roadmap declares tiered topic storage under "Topic
Management" (`/root/reference/README.md`); this pins the wire-visible
contract: ListOffsets v8 serves EARLIEST_LOCAL_TIMESTAMP (-4), v9
serves LATEST_TIERED_TIMESTAMP (-5), sentinels below their version
floor get per-partition UNSUPPORTED_VERSION, tiered offsets remain
fetchable (the remote-fetch model), and the `remote.storage.enable` +
`local.retention.{bytes,ms}` topic configs drive tiering on append.
"""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import WireLog
from kcore_spark.protocol.records import Record
from kcore_spark.protocol.server import KafkaFrontend

EARLIEST_LOCAL = -4
LATEST_TIERED = -5


def _list_offsets(version, topic, partition, ts, corr=95):
    w = wire.Writer()
    w.int16(wire.LIST_OFFSETS_KEY).int16(version).int32(corr)
    w.nullable_string("pytest")
    w.empty_tagged_fields()  # flexible header (v6+)
    w.int32(-1)  # replica_id
    w.int8(0)  # isolation_level
    w.compact_array_len(1)
    w.compact_string(topic)
    w.compact_array_len(1)
    w.int32(partition).int32(-1).int64(ts)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _parse(resp):
    r = wire.Reader(resp)
    corr = r.int32()
    r.tagged_fields()
    r.int32()  # throttle
    assert r.compact_array_len() == 1
    name = r.compact_string()
    assert r.compact_array_len() == 1
    p = r.int32()
    err = r.int16()
    ts = r.int64()
    off = r.int64()
    return name, p, err, ts, off


def _fe_with_tiered():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("tr", 1)
    fe.wire_log.append(
        "tr", 0, [Record(b"k", str(i).encode(), 1000 + i) for i in range(10)]
    )
    fe.wire_log.tier_to("tr", 0, 6)  # offsets 0-5 → remote tier
    return fe


# ----------------------------------------------------------- WireLog model


def test_tier_to_moves_boundary_and_keeps_records_readable():
    log = WireLog()
    log.create_topic("t", 1)
    log.append("t", 0, [Record(b"k", b"v", 1000 + i) for i in range(8)])
    assert log.local_log_start("t", 0) == 0
    assert log.latest_tiered("t", 0) == -1
    assert log.tier_to("t", 0, 5) == 5
    assert log.local_log_start("t", 0) == 5
    assert log.latest_tiered("t", 0) == 4
    assert log.log_start("t", 0) == 0  # log start unmoved: data not deleted
    # remote fetch: tiered offsets still readable
    got = log.read("t", 0, 0, 100)
    assert [r.offset for r in got] == list(range(8))


def test_tiering_never_retreats_and_clamps_to_hw():
    log = WireLog()
    log.create_topic("t", 1)
    log.append("t", 0, [Record(b"k", b"v", 1000)] * 4)
    assert log.tier_to("t", 0, 3) == 3
    assert log.tier_to("t", 0, 1) == 3  # no retreat
    assert log.tier_to("t", 0, 99) == 4  # clamp to high watermark


def test_delete_records_past_tier_boundary_clamps_local_start():
    log = WireLog()
    log.create_topic("t", 1)
    log.append("t", 0, [Record(b"k", b"v", 1000)] * 6)
    log.tier_to("t", 0, 3)
    log.delete_records("t", 0, 5)  # log start now ABOVE the tier boundary
    assert log.local_log_start("t", 0) == 5
    # DeleteRecords deletes from the remote tier too: everything tiered
    # now sits below the log start, so nothing tiered remains live
    assert log.latest_tiered("t", 0) == -1


def test_local_retention_bytes_tiers_suffix_on_append():
    log = WireLog()
    log.create_topic(
        "t", 1, configs={"remote.storage.enable": "true", "local.retention.bytes": "30"}
    )
    # ten 10-byte values: local suffix budget keeps the newest 3
    log.append("t", 0, [Record(b"k", b"x" * 10, 1000 + i) for i in range(10)])
    assert log.local_log_start("t", 0) == 7
    assert log.latest_tiered("t", 0) == 6
    assert log.high_watermark("t", 0) == 10


def test_local_retention_ms_tiers_by_stream_time():
    log = WireLog()
    log.create_topic(
        "t", 1, configs={"remote.storage.enable": "true", "local.retention.ms": "100"}
    )
    log.append("t", 0, [Record(b"k", b"v", ts) for ts in (1000, 1050, 1200, 1300)])
    # stream time 1300, cutoff 1200: records at 1000/1050 tier out
    assert log.local_log_start("t", 0) == 2
    assert log.latest_tiered("t", 0) == 1


def test_retention_configs_inert_without_enable_flag():
    log = WireLog()
    log.create_topic("t", 1, configs={"local.retention.bytes": "1"})
    log.append("t", 0, [Record(b"k", b"x" * 10, 1000)] * 3)
    assert log.local_log_start("t", 0) == 0
    assert log.latest_tiered("t", 0) == -1


# ------------------------------------------------------------ wire surface


def test_v8_earliest_local():
    fe = _fe_with_tiered()
    name, p, err, ts, off = _parse(fe.handle_request(_list_offsets(8, "tr", 0, EARLIEST_LOCAL)))
    assert (name, p, err) == ("tr", 0, wire.ERR_NONE)
    assert off == 6


def test_v9_latest_tiered():
    fe = _fe_with_tiered()
    name, p, err, ts, off = _parse(fe.handle_request(_list_offsets(9, "tr", 0, LATEST_TIERED)))
    assert (name, p, err) == ("tr", 0, wire.ERR_NONE)
    assert off == 5


def test_v9_latest_tiered_nothing_tiered_is_minus_one():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("tr", 1)
    fe.wire_log.append("tr", 0, [Record(b"k", b"v", 1000)])
    name, p, err, ts, off = _parse(fe.handle_request(_list_offsets(9, "tr", 0, LATEST_TIERED)))
    assert err == wire.ERR_NONE
    assert off == -1


def test_sentinels_below_version_floor_rejected():
    fe = _fe_with_tiered()
    for v, ts in ((7, EARLIEST_LOCAL), (8, LATEST_TIERED), (6, -3)):
        name, p, err, _, off = _parse(fe.handle_request(_list_offsets(v, "tr", 0, ts)))
        assert err == wire.ERR_UNSUPPORTED_VERSION, (v, ts)
        assert off == -1


def test_classic_sentinels_unaffected_by_tiering():
    fe = _fe_with_tiered()
    _, _, err, _, earliest = _parse(fe.handle_request(_list_offsets(9, "tr", 0, -2)))
    assert (err, earliest) == (wire.ERR_NONE, 0)  # full log start, not local
    _, _, err, _, latest = _parse(fe.handle_request(_list_offsets(9, "tr", 0, -1)))
    assert (err, latest) == (wire.ERR_NONE, 10)

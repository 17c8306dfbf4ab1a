"""Retention + DeleteRecords (VERDICT r2 #3): truncated offsets vanish
from fetch/scan, watermarks and manifest stay consistent, a crash
between the state commit and the physical delete self-heals, and
time/size retention drops whole segment prefixes only."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import WireLog
from kcore_spark.protocol.records import Record
from kcore_spark.protocol.server import KafkaFrontend
from kcore_spark.sources.topic_log import TopicLog

# ------------------------------------------------------ WireLog plane


def test_wirelog_delete_records_semantics():
    log = WireLog()
    log.create_topic("t", 1)
    log.append("t", 0, [Record(b"k", str(i).encode(), 100 + i) for i in range(10)])
    assert log.delete_records("t", 0, 4) == 4
    assert log.log_start("t", 0) == 4
    assert log.high_watermark("t", 0) == 10  # hw never moves on truncate
    # reads below the start clamp to it; offsets are preserved
    assert [r.offset for r in log.read("t", 0, 0, 100)] == list(range(4, 10))
    assert [r.value for r in log.read("t", 0, 6, 2)] == [b"6", b"7"]
    # appends continue at the high watermark
    assert log.append("t", 0, [Record(b"k", b"new", 200)]) == 10
    # -1 = everything; truncation is monotonic
    assert log.delete_records("t", 0, -1) == 11
    assert log.read("t", 0, 0, 100) == []
    with pytest.raises(ValueError):
        log.delete_records("t", 0, 99)


def _delete_records_payload(topic: str, partition: int, offset: int, corr=31) -> bytes:
    w = wire.Writer()
    w.int16(wire.DELETE_RECORDS_KEY).int16(1).int32(corr)
    w.nullable_string("pytest")
    w.int32(1)
    w.nullable_string(topic)
    w.int32(1)
    w.int32(partition).int64(offset)
    w.int32(30000)  # timeout_ms
    return w.bytes()


def _parse_delete_records_response(resp: bytes):
    r = wire.Reader(resp)
    corr = r.int32()
    r.int32()  # throttle
    out = {}
    for _ in range(r.int32()):
        name = r.nullable_string()
        for _ in range(r.int32()):
            p = r.int32()
            low = r.int64()
            err = r.int16()
            out[(name, p)] = (low, err)
    return corr, out


def test_delete_records_wire_roundtrip():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    fe.wire_log.append("t", 0, [Record(b"k", b"v", 1) for _ in range(5)])
    corr, out = _parse_delete_records_response(
        fe.handle_request(_delete_records_payload("t", 0, 3))
    )
    assert corr == 31
    assert out == {("t", 0): (3, wire.ERR_NONE)}
    # earliest via ListOffsets reflects the new start
    from tests.test_admin import _list_offsets_payload

    r = wire.Reader(fe.handle_request(_list_offsets_payload("t", 0, -2)))
    r.int32(), r.int32(), r.nullable_string(), r.int32(), r.int32(), r.int16(), r.int64()
    assert r.int64() == 3
    # beyond hw → OFFSET_OUT_OF_RANGE; unknown partition → err 3
    _, out = _parse_delete_records_response(
        fe.handle_request(_delete_records_payload("t", 0, 99))
    )
    assert out[("t", 0)] == (-1, wire.ERR_OFFSET_OUT_OF_RANGE)
    _, out = _parse_delete_records_response(
        fe.handle_request(_delete_records_payload("t", 7, 0))
    )
    assert out[("t", 7)] == (-1, wire.ERR_UNKNOWN_TOPIC_OR_PARTITION)


def test_delete_records_v2_flexible_roundtrip():
    fe = KafkaFrontend()
    fe.wire_log.create_topic("t", 1)
    fe.wire_log.append("t", 0, [Record(b"k", b"v", 1) for _ in range(5)])
    w = wire.Writer()
    w.int16(wire.DELETE_RECORDS_KEY).int16(2).int32(32)
    w.nullable_string("pytest")
    w.empty_tagged_fields()  # header v2
    w.compact_array_len(1)
    w.compact_string("t")
    w.compact_array_len(1)
    w.int32(0).int64(3)
    w.empty_tagged_fields()  # partition
    w.empty_tagged_fields()  # topic
    w.int32(30000)
    w.empty_tagged_fields()  # body
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 32
    r.tagged_fields()  # response header v1
    r.int32()  # throttle
    assert r.compact_array_len() == 1
    assert r.compact_string() == "t"
    assert r.compact_array_len() == 1
    assert (r.int32(), r.int64(), r.int16()) == (0, 3, wire.ERR_NONE)
    r.tagged_fields()
    r.tagged_fields()
    r.tagged_fields()
    assert r.pos == len(r.buf)  # fully consumed — no stray bytes


def test_fetch_below_log_start_is_out_of_range():
    from tests.test_protocol_versions import _fetch_payload
    from kcore_spark.protocol.broker import decode_fetch_response

    fe = KafkaFrontend()
    fe.wire_log.create_topic("alpha", 1)
    fe.wire_log.append("alpha", 0, [Record(b"k", b"v", 1) for _ in range(5)])
    fe.wire_log.delete_records("alpha", 0, 3)
    _, results = decode_fetch_response(fe.handle_request(_fetch_payload(5, "alpha", 0, 0)), 5)
    [(_, [(idx, err, hw, batch)])] = results
    assert err == wire.ERR_OFFSET_OUT_OF_RANGE and hw == 5


# ------------------------------------------------------ TopicLog plane


@pytest.fixture()
def log(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_ret_") as d:
        yield TopicLog(spark, d)


def _ts_records(spark, n, start_seq, base_ms):
    return spark.range(n).select(
        F.encode((F.col("id") % 5).cast("string"), "utf-8").alias("key"),
        F.encode((F.col("id") + start_seq).cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(base_ms) + F.col("id") * 10).alias("timestamp"),
        (F.col("id") + start_seq).alias("seq"),
    )


def test_truncate_before_hides_and_reclaims(spark, log):
    log.create_topic("t", 2)
    for b in range(3):
        log.produce("t", _ts_records(spark, 20, b * 20, 1_000_000 + b * 10_000), order_by=["seq"])
    wm_before = log._watermarks("t")
    starts = log.truncate_before("t", {0: 10, 1: 10})
    assert starts == {0: 10, 1: 10}
    # truncated offsets vanish from scan and fetch
    assert log.scan("t").where(F.col("offset") < 10).count() == 0
    assert log.fetch("t", 0, 0, 100).where(F.col("offset") < 10).count() == 0
    lo = {r["partition"]: r["earliest"] for r in log.list_offsets("t").collect()}
    assert lo == {0: 10, 1: 10}
    # high watermarks unchanged; appends continue at them
    assert log._watermarks("t") == wm_before
    # segments wholly below the boundary are physically gone
    man = log._load_manifest("t")
    for entries in man.values():
        for e in entries:
            assert e["max"] >= 10
    # monotonic: a lower truncation request is a no-op
    assert log.truncate_before("t", {0: 5}) == {0: 10, 1: 10}


def test_truncate_crash_between_state_and_delete_recovers(spark, log):
    log.create_topic("t", 1)
    for b in range(3):
        log.produce("t", _ts_records(spark, 10, b * 10, 1_000_000), order_by=["seq"])
    n_files = len(glob.glob(os.path.join(log.root, "t/data/partition=0/*.parquet")))
    assert n_files == 3
    # simulate a crash AFTER the state commit, BEFORE physical delete
    log._set_log_starts("t", {0: 20})
    # logically truncated immediately — even with dead files on disk
    assert log.scan("t").agg(F.min("offset")).collect()[0][0] == 20
    assert log.fetch("t", 0, 0, 100).agg(F.min("offset")).collect()[0][0] == 20
    # the next truncation pass reclaims the dead segments
    log.truncate_before("t", {0: 20})
    remaining = glob.glob(os.path.join(log.root, "t/data/partition=0/*.parquet"))
    assert len(remaining) == 1
    man = log._load_manifest("t")
    assert [e["max"] >= 20 for e in man["partition=0"]] == [True]


def test_retention_by_time_drops_old_segments(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _ts_records(spark, 10, 0, 1_000_000), order_by=["seq"])  # old
    log.produce("t", _ts_records(spark, 10, 10, 2_000_000), order_by=["seq"])  # mid
    log.produce("t", _ts_records(spark, 10, 20, 9_000_000), order_by=["seq"])  # new
    # keep 1h from "now"=9_500_000 → cutoff 5_900_000: old+mid expire
    starts = log.apply_retention("t", retention_ms=3_600_000, now_ms=9_500_000)
    assert starts == {0: 20}
    assert log.scan("t").agg(F.min("offset")).collect()[0][0] == 20
    files = glob.glob(os.path.join(log.root, "t/data/partition=0/*.parquet"))
    assert len(files) == 1
    # nothing further expires at the same clock
    assert log.apply_retention("t", retention_ms=3_600_000, now_ms=9_500_000) == {0: 20}


def test_retention_by_size_keeps_tail(spark, log):
    log.create_topic("t", 1)
    for b in range(4):
        log.produce("t", _ts_records(spark, 10, b * 10, 1_000_000 + b), order_by=["seq"])
    man = log._load_manifest("t")
    sizes = sorted((e["min"], e["bytes"]) for e in man["partition=0"])
    # budget for exactly the last two segments
    budget = sizes[-1][1] + sizes[-2][1]
    starts = log.apply_retention("t", retention_bytes=budget)
    assert starts == {0: 20}
    assert log.scan("t").count() == 20
    # the active (newest) segment is never dropped even with budget 0
    starts = log.apply_retention("t", retention_bytes=0)
    assert starts == {0: 30}
    assert log.scan("t").count() == 10


def test_truncate_then_compact_stays_consistent(spark, log):
    log.create_topic("t", 1)
    for b in range(2):
        log.produce("t", _ts_records(spark, 20, b * 20, 1_000_000), order_by=["seq"])
    log.truncate_before("t", {0: 15})
    n = log.compact("t")
    # compaction operates on the retained suffix only
    assert log.scan("t").agg(F.min("offset")).collect()[0][0] >= 15
    assert n == log.scan("t").count()
    got = log.fetch("t", 0, 0, 100).select("offset").collect()
    assert all(r["offset"] >= 15 for r in got)


# --------------------------------------------- background cleaner


class _StubTopicLog:
    """Records cleaner passes without Spark."""

    def __init__(self):
        self.passes = 0

    def list_topics(self):
        return []

    def run_cleanup_all(self, now_ms=None):
        self.passes += 1
        return {}


def test_background_cleaner_runs_and_stops():
    import asyncio

    from kcore_spark.protocol.server import KafkaFrontend

    async def scenario():
        stub = _StubTopicLog()
        fe = KafkaFrontend(port=0, topic_log=stub, cleaner_interval_ms=20)
        await fe.start()
        try:
            for _ in range(100):
                await asyncio.sleep(0.02)
                if fe.cleaner_passes >= 2:
                    break
            assert fe.cleaner_passes >= 2, "cleaner never ran"
        finally:
            await fe.stop()
        assert fe._cleaner_task is None
        settled = fe.cleaner_passes
        await asyncio.sleep(0.1)
        assert stub.passes == settled, "cleaner kept running after stop"

    asyncio.run(scenario())


def test_cleaner_off_by_default():
    import asyncio

    from kcore_spark.protocol.server import KafkaFrontend

    async def scenario():
        fe = KafkaFrontend(port=0, topic_log=_StubTopicLog())
        await fe.start()
        try:
            assert fe._cleaner_task is None
        finally:
            await fe.stop()

    asyncio.run(scenario())


# --------------------------------------------- tiered storage (archive)


def test_truncate_archives_segments_when_tier_configured(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_hot_") as hot, tempfile.TemporaryDirectory(
        prefix="kcore_cold_"
    ) as cold:
        log = TopicLog(spark, hot, archive_root=cold)
        log.create_topic("t", 1)
        for b in range(2):
            log.produce("t", _ts_records(spark, 20, b * 20, 1_000_000), order_by=["seq"])
        assert log.scan_archive("t") is None  # nothing aged out yet
        log.truncate_before("t", {0: 20})
        # hot log serves only the retained suffix
        assert log.scan("t").count() == 20
        assert log.scan("t").agg(F.min("offset")).collect()[0][0] == 20
        # the aged-out segment moved to the cold tier, readable as parquet
        cold_df = log.scan_archive("t")
        assert cold_df is not None
        assert cold_df.count() == 20
        assert cold_df.agg(F.max("offset")).collect()[0][0] == 19
        # hot+cold = full history (the backfill contract)
        assert cold_df.count() + log.scan("t").count() == 40
        archived = glob.glob(os.path.join(cold, "t", "**", "*.parquet"), recursive=True)
        assert archived, "no files landed in the archive tier"


def test_truncate_deletes_without_archive_root(spark, log):
    log.create_topic("t", 1)
    for b in range(2):
        log.produce("t", _ts_records(spark, 20, b * 20, 1_000_000), order_by=["seq"])
    log.truncate_before("t", {0: 20})
    assert log.scan_archive("t") is None if log.archive_root else True
    assert log.archive_root is None
    assert log.scan("t").count() == 20


def test_archive_tier_retention_ages_out_cold_files(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_hot2_") as hot, tempfile.TemporaryDirectory(
        prefix="kcore_cold2_"
    ) as cold:
        log = TopicLog(spark, hot, archive_root=cold)
        log.create_topic("t", 1)
        # two segments an hour apart; both age into the archive
        log.produce("t", _ts_records(spark, 10, 0, 1_000_000), order_by=["seq"])
        log.produce("t", _ts_records(spark, 10, 10, 4_600_000), order_by=["seq"])
        log.truncate_before("t", {0: 20})
        assert log.scan_archive("t").count() == 20
        # cutoff between the two segments' timestamps: only the older dies
        n = log.apply_archive_retention("t", retention_ms=3_600_000, now_ms=6_000_000)
        assert n >= 1
        remaining = log.scan_archive("t")
        assert remaining is not None and remaining.count() == 10
        assert remaining.agg(F.min("offset")).collect()[0][0] == 10
        # idempotent second pass
        assert log.apply_archive_retention("t", retention_ms=3_600_000, now_ms=6_000_000) == 0


def test_archive_retention_noop_without_tier(spark, log):
    log.create_topic("t", 1)
    assert log.apply_archive_retention("t", retention_ms=1) == 0


# ------------------------------------------------------ key erasure (GDPR)


def test_erase_keys_removes_across_hot_and_cold(spark):
    import tempfile as tf

    from pyspark.sql import functions as F2

    with tf.TemporaryDirectory(prefix="kcore_erase_h_") as hot, tf.TemporaryDirectory(
        prefix="kcore_erase_c_"
    ) as cold:
        log = TopicLog(spark, hot, archive_root=cold)
        log.create_topic("t", 2)
        for b in range(2):
            log.produce(
                "t", _ts_records(spark, 20, b * 20, 1_000_000 + b * 10_000), order_by=["seq"]
            )
        # age the first batch's segments into the cold tier
        log.alter_topic_config("t", {"retention.ms": "1"})
        log.apply_retention_from_config("t", now_ms=10_000_000_000)
        assert log.scan_archive("t") is not None
        # keys are id%5 strings; erase key b"3" everywhere
        total_before = log.scan("t").count() + log.scan_archive("t").count()
        k3_hot = log.scan("t").where(F2.col("key") == b"3").count()
        k3_cold = log.scan_archive("t").where(F2.col("key") == b"3").count()
        assert k3_hot + k3_cold > 0
        removed = log.erase_keys("t", [b"3"])
        assert removed == k3_hot + k3_cold
        assert log.scan("t").where(F2.col("key") == b"3").count() == 0
        arch = log.scan_archive("t")
        assert arch is None or arch.where(F2.col("key") == b"3").count() == 0
        # surviving records keep their offsets (holes, like compaction)
        total_after = log.scan("t").count() + (arch.count() if arch is not None else 0)
        assert total_after == total_before - removed
        # watermarks unmoved: appends continue at the old high watermark
        wm = log._watermarks("t")
        log.produce("t", _ts_records(spark, 2, 100, 2_000_000), order_by=["seq"])
        wm2 = log._watermarks("t")
        assert all(wm2[p] >= wm[p] for p in wm)


def test_erase_keys_no_archive_tier(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _ts_records(spark, 10, 0, 1_000_000), order_by=["seq"])
    n = log.scan("t").where(F.col("key").isin([b"1", b"2"])).count()
    assert log.erase_keys("t", [b"1", b"2"]) == n
    assert log.scan("t").where(F.col("key").isin([b"1", b"2"])).count() == 0
    # fetch path still healthy after the swap (manifest refreshed)
    assert log.fetch("t", 0, 0, 100).count() == 10 - n

"""Snapshot-versioned (time-travel) topic reads: every produce commit
is a readable version, scan_at reconstructs exactly the state at that
commit, history is bounded (snapshot expiration), and truncated data
is never resurrected."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog


@pytest.fixture()
def log(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_tt_") as d:
        yield TopicLog(spark, d)


def _records(spark, n, start_seq):
    return spark.range(n).select(
        F.encode((F.col("id") % 5).cast("string"), "utf-8").alias("key"),
        F.encode((F.col("id") + start_seq).cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(1_000_000) + F.col("id") * 10).alias("timestamp"),
        (F.col("id") + start_seq).alias("seq"),
    )


def test_each_produce_is_a_readable_version(spark, log):
    log.create_topic("t", 2)
    for b in range(3):
        log.produce("t", _records(spark, 10, b * 10), order_by=["seq"])
    versions = log.snapshot_versions("t")
    assert [v for v, _ in versions] == [1, 2, 3]
    # each version sees exactly the prefix committed by then
    for v, _wm in versions:
        assert log.scan_at("t", v).count() == 10 * v
    # version watermarks are the per-partition next offsets at commit
    assert sum(versions[0][1].values()) == 10
    # current scan == newest version
    assert log.scan("t").count() == log.scan_at("t", 3).count()


def test_unknown_version_rejected(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _records(spark, 5, 0), order_by=["seq"])
    with pytest.raises(ValueError, match="unknown snapshot version"):
        log.scan_at("t", 99)


def test_history_is_bounded(spark, log):
    log.create_topic("t", 1)
    log.MAX_SNAPSHOTS = 4
    for b in range(6):
        log.produce("t", _records(spark, 2, b * 2), order_by=["seq"])
    versions = [v for v, _ in log.snapshot_versions("t")]
    # oldest versions expired, numbering preserved
    assert versions == [3, 4, 5, 6]
    with pytest.raises(ValueError):
        log.scan_at("t", 1)


def test_time_travel_does_not_resurrect_truncated_data(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _records(spark, 10, 0), order_by=["seq"])
    log.produce("t", _records(spark, 10, 10), order_by=["seq"])
    log.truncate_before("t", {0: 15})
    # v1 covered offsets [0, 10); all of them are below the log start
    # now — the snapshot is readable but its reclaimed rows are gone
    assert log.scan_at("t", 1).count() == 0
    assert log.scan_at("t", 2).where(F.col("offset") >= 15).count() == 5


def test_snapshot_survives_sink_commit_flips(spark, log):
    """Sink commits ride the same control file; recording one must not
    corrupt or drop the snapshot history."""
    log.create_topic("t", 1)
    log.produce("t", _records(spark, 4, 0), order_by=["seq"])
    log.produce(
        "t", _records(spark, 4, 4), order_by=["seq"], sink_commit=("sink-a", 7)
    )
    assert log.sink_committed("t", "sink-a") == 7
    assert [v for v, _ in log.snapshot_versions("t")] == [1, 2]
    assert log.scan_at("t", 1).count() == 4


# ------------------------------------------------------ OPTIMIZE (file compaction)


def test_optimize_merges_small_segments(spark, log):
    """Many tiny produces → many tiny segments; optimize() bin-packs
    them per partition without changing a single record, offset, or
    watermark — and pruned reads still work off the refreshed
    manifest."""
    from pyspark.sql import functions as F

    log.create_topic("t", 2)
    for b in range(6):
        log.produce("t", _records(spark, 10, b * 10), order_by=["seq"])
    man_before = log._load_manifest("t")
    files_before = {p: len(es) for p, es in man_before.items()}
    assert all(n >= 6 for n in files_before.values())
    rows_before = sorted(
        (r["partition"], r["offset"], bytes(r["value"]))
        for r in log.scan("t").collect()
    )
    wm_before = log._watermarks("t")

    result = log.optimize("t", target_bytes=10 * 1024 * 1024)
    assert set(result) == {0, 1}
    for p, (before, after) in result.items():
        assert before >= 6 and after == 1  # tiny segments → one file
    man_after = log._load_manifest("t")
    assert {p: len(es) for p, es in man_after.items()} == {p: 1 for p in man_before}
    # records, offsets, watermarks all identical
    rows_after = sorted(
        (r["partition"], r["offset"], bytes(r["value"]))
        for r in log.scan("t").collect()
    )
    assert rows_after == rows_before
    assert log._watermarks("t") == wm_before
    # pruned fetch still correct
    assert sorted(r["offset"] for r in log.fetch("t", 0, 5, 10).collect()) == list(
        range(5, 15)
    )
    # a second optimize is a no-op (already well-packed)
    assert log.optimize("t", target_bytes=10 * 1024 * 1024) == {}


def test_optimize_skips_well_sized_partitions(spark, log):
    log.create_topic("t", 1)
    log.produce("t", _records(spark, 20, 0), order_by=["seq"])
    # single segment → nothing to do
    assert log.optimize("t") == {}


def test_cleaner_runs_optimize_when_configured(spark, log):
    log.create_topic(
        "t", 1, configs={"optimize.target.bytes": str(10 * 1024 * 1024)}
    )
    for b in range(4):
        log.produce("t", _records(spark, 5, b * 5), order_by=["seq"])
    out = log.run_cleanup("t")
    assert out["optimized"] == {0: (4, 1)}
    assert log.scan("t").count() == 20
    # topics without the config are untouched
    log.create_topic("u", 1)
    log.produce("u", _records(spark, 5, 0), order_by=["seq"])
    assert log.run_cleanup("u")["optimized"] is None

"""ADVICE r13 closures on the topic-log storage plane:

1. maintenance_lock on a MISSING hot topic dir must not fabricate one
   (scan_archive healing a cold-only topic left an empty hot dir whose
   missing data/ read as permanent crash evidence to later readers).
2. scan()'s FIRST read is itself inside the swap hazard window: a
   PATH_NOT_FOUND there must route through the maintenance-locked
   recover-and-rebuild branch, not surface.
3. _refresh_manifest_unlocked's drop-phase guard must treat a
   data.old-* whole-dir swap as evidence (not just optimize's
   data.part-old-* markers), and offsets_for_timestamp must verify an
   initially-empty plan with one heal-and-replan pass before
   answering -1.
4. (documented, not code): mid-trigger maintenance makes the pyds
   streaming read fail transiently — see TopicLogStreamReader's
   docstring.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog, maintenance_lock


def _records(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


def test_maintenance_lock_leaves_no_residue_on_missing_topic_dir(tmp_path):
    tdir = str(tmp_path / "root" / "coldtopic")
    os.makedirs(str(tmp_path / "root"))
    with maintenance_lock(tdir):
        assert not os.path.isdir(tdir), (
            "locking a nonexistent topic dir must not create it"
        )
    assert not os.path.isdir(tdir)
    # the sibling lock file is invisible to list_topics (no _meta.json
    # and a dotfile name)
    names = os.listdir(str(tmp_path / "root"))
    assert names == [".coldtopic.maint.lock"], names


def test_maintenance_lock_still_uses_inner_file_when_dir_exists(tmp_path):
    tdir = str(tmp_path / "t")
    os.makedirs(tdir)
    with maintenance_lock(tdir):
        assert os.path.exists(os.path.join(tdir, "_maint.lock"))


def test_cold_only_heal_creates_no_hot_dir(spark):
    """scan_archive healing a crashed cold-tier swap of a topic whose
    hot dir is GONE must restore the archive without leaving a hot-tier
    topic dir behind (ADVICE r13 #1)."""
    import shutil

    with tempfile.TemporaryDirectory(prefix="kc_hot_") as hot, tempfile.TemporaryDirectory(
        prefix="kc_cold_"
    ) as cold:
        log = TopicLog(spark, hot, archive_root=cold)
        log.create_topic("t", 1)
        log.produce("t", _records(spark, 6), order_by=["seq"])
        log.produce("t", _records(spark, 6, start=6), order_by=["seq"])
        hw = log._watermarks("t")
        log.truncate_before("t", {0: hw[0]})  # archive everything it can
        assert log.scan_archive("t") is not None
        # simulate the topic aging fully out of the hot tier...
        shutil.rmtree(os.path.join(hot, "t"))
        # ...and a crashed cold erasure swap (dir renamed to .old-*)
        os.rename(os.path.join(cold, "t"), os.path.join(cold, "t.old-123"))
        df = log.scan_archive("t")
        assert df is not None and df.count() > 0
        assert os.path.isdir(os.path.join(cold, "t")), "cold swap healed"
        assert not os.path.isdir(os.path.join(hot, "t")), (
            "healing the cold tier must not fabricate a hot topic dir"
        )
        # a later reader sees no crash evidence for the hot tier
        assert not TopicLog._swap_crash_suspected(os.path.join(hot, "t"))


def test_scan_first_read_survives_swap_window(spark, monkeypatch):
    """A swap that lands between scan()'s pre-heal check and its first
    spark.read must be healed by the locked rebuild branch, not leak
    PATH_NOT_FOUND (ADVICE r13 #2). Simulated by disabling the pre-heal
    and leaving the log in the crashed-swap state (data/ renamed to
    data.old-*)."""
    with tempfile.TemporaryDirectory(prefix="kc_scan_") as root:
        log = TopicLog(spark, root)
        log.create_topic("t", 2)
        log.produce("t", _records(spark, 10), order_by=["seq"])
        tdir = os.path.join(root, "t")
        os.rename(os.path.join(tdir, "data"), os.path.join(tdir, "data.old-7"))
        monkeypatch.setattr(log, "_heal_if_swap_marked", lambda topic: None)
        rows = log.scan("t").count()
        assert rows == 10
        assert os.path.isdir(os.path.join(tdir, "data")), "swap healed"


def test_scan_missing_topic_still_raises(spark):
    with tempfile.TemporaryDirectory(prefix="kc_missing_") as root:
        log = TopicLog(spark, root)
        try:
            log.scan("never-created").count()
            raise AssertionError("scan of a nonexistent topic must raise")
        except AssertionError:
            raise
        except Exception:
            pass  # PATH_NOT_FOUND / AnalysisException — unchanged contract


def test_refresh_manifest_drop_guard_covers_whole_dir_swap(spark):
    """An unscoped manifest refresh racing a compact/erase WHOLE-DIR
    swap (data.old-* evidence, partition dirs unlistable) must not
    prune the live partitions' entries (ADVICE r13 #3)."""
    with tempfile.TemporaryDirectory(prefix="kc_refresh_") as root:
        log = TopicLog(spark, root)
        log.create_topic("t", 2)
        log.produce("t", _records(spark, 10), order_by=["seq"])
        man_before = log._load_manifest("t")
        assert man_before, "manifest populated by produce"
        tdir = os.path.join(root, "t")
        # mid-swap state: data/ renamed away, .old marker present
        os.rename(os.path.join(tdir, "data"), os.path.join(tdir, "data.old-9"))
        man_after = log._refresh_manifest("t")
        assert man_after == man_before, (
            "refresh during a whole-dir swap window must keep the live "
            "entries, not persist a partition drop"
        )
        # restore and confirm the entries still resolve
        os.rename(os.path.join(tdir, "data.old-9"), os.path.join(tdir, "data"))
        assert log.scan("t").count() == 10


def test_offsets_for_timestamp_verifies_initially_empty_plan(spark):
    """A manifest wrongly pruned by a racing swap must not turn
    offsets_for_timestamp into -1s: the initially-empty plan gets one
    heal-and-replan pass before answering (ADVICE r13 #3)."""
    with tempfile.TemporaryDirectory(prefix="kc_ofts_") as root:
        log = TopicLog(spark, root)
        log.create_topic("t", 2)
        log.produce("t", _records(spark, 10), order_by=["seq"])
        good = {
            r["partition"]: r["offset"]
            for r in log.offsets_for_timestamp("t", 0).collect()
        }
        assert all(v >= 0 for v in good.values())
        # simulate the pruned-lie manifest: nonempty (so the manifest
        # path is taken) but missing every real entry
        man_path = os.path.join(root, "t", "_manifest.json")
        with open(man_path) as f:
            assert json.load(f)
        with open(man_path, "w") as f:
            json.dump({"partition=0": []}, f)
        got = {
            r["partition"]: r["offset"]
            for r in log.offsets_for_timestamp("t", 0).collect()
        }
        assert got == good, (
            "empty plan must heal-and-replan, not answer -1: "
            f"{got} vs {good}"
        )

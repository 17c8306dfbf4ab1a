"""Cross-process STREAMING reader vs live maintenance (r12 VERDICT #3).

tests/test_maintenance_stress_mp.py proved batch readers survive a
maintenance loop in another process; this suite proves the STREAMING
path does: a child process runs a checkpointed ``kcore_topic`` stream
(availableNow drain loop, retrying the documented transient
mid-trigger failure class), while the parent produces fresh rows and
loops optimize/compact/erase_keys on the same topic root. Midway the
child is SIGKILLed (crash shape) and a second child resumes from the
same checkpoint; a final drain runs after maintenance quiesces.

Invariant — exactly-once delivery of every committed offset:
- deduped by micro-batch id (foreachBatch is at-least-once on crash;
  a replayed batch id must carry the IDENTICAL offset set, which the
  offset-tracking source guarantees because offsets are immutable),
  every (partition, offset) appears exactly once across the whole
  run;
- the delivered set equals the final log exactly (keys are unique, so
  compaction/erasure remove nothing and optimize only rewrites files);
- the children exit cleanly (transients recovered), and no swap
  debris survives.

Marked slow: two child JVMs cost ~40s.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import textwrap
import threading
import time

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.pyds import TopicLogDataSource
from kcore_spark.sources.topic_log import TopicLog

_CHILD = textwrap.dedent(
    """
    import json, os, sys, time
    root, topic, ckpt, outpath, rounds = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5])
    )
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from kcore_spark.sources.pyds import TopicLogDataSource

    TRANSIENT = (
        "FILE_NOT_EXIST", "FileNotFoundException", "does not exist",
        "NoSuchFileException", "PATH_NOT_FOUND", "vanished during read",
    )
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("stream-child")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    spark.dataSource.register(TopicLogDataSource)

    def collect(df, bid):
        rows = df.select("partition", "offset").collect()
        line = json.dumps(
            {"bid": bid, "offsets": sorted([r["partition"], r["offset"]] for r in rows)}
        )
        with open(outpath, "a") as f:
            f.write(line + chr(10))
            f.flush()
            os.fsync(f.fileno())

    for _ in range(rounds):
        for attempt in range(8):
            try:
                q = (
                    spark.readStream.format("kcore_topic")
                    .option("root", root)
                    .option("topic", topic)
                    .load()
                    .writeStream.foreachBatch(collect)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                break
            except Exception as e:  # transient mid-trigger swap: retry
                if not any(t in str(e) for t in TRANSIENT):
                    raise
                time.sleep(0.3)
        else:
            raise SystemExit("transient retry budget exhausted")
        time.sleep(0.2)
    print("CHILD_OK")
    spark.stop()
    """
)


def _records(spark, n, start=0):
    # UNIQUE keys: compaction keeps every record, erasure of the
    # sentinel key removes nothing — maintenance only rewrites files,
    # so exactly-once delivery of every offset is checkable
    return spark.range(start, start + n).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


def _parse_deliveries(outpath):
    """{bid: offsets} with torn trailing lines tolerated (SIGKILL can
    land mid-append); a REPLAYED bid must carry the identical set."""
    per_bid: dict[int, list] = {}
    conflicts = []
    if not os.path.exists(outpath):
        return per_bid, conflicts
    with open(outpath) as f:
        lines = f.read().splitlines()
    for i, line in enumerate(lines):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                continue  # torn final append from the SIGKILL
            raise
        offsets = [tuple(x) for x in rec["offsets"]]
        if rec["bid"] in per_bid and per_bid[rec["bid"]] != offsets:
            conflicts.append((rec["bid"], per_bid[rec["bid"]], offsets))
        per_bid[rec["bid"]] = offsets
    return per_bid, conflicts


@pytest.mark.slow
def test_streaming_reader_exactly_once_across_maintenance_and_kill(spark):
    root = tempfile.mkdtemp(prefix="kcore_stream_mp_")
    ckpt = tempfile.mkdtemp(prefix="kcore_stream_mp_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="kcore_stream_mp_out_"), "seen.jsonl")
    log = TopicLog(spark, root)
    log.create_topic("t", 2)
    log.produce("t", _records(spark, 16), order_by=["seq"])

    produced = [16]
    stop = threading.Event()
    maint_errors: list = []

    def maintenance():
        i = 0
        while not stop.is_set():
            try:
                log.produce(
                    "t", _records(spark, 8, start=produced[0]), order_by=["seq"]
                )
                produced[0] += 8
                log.optimize("t", target_bytes=512 * 1024 * 1024)
                log.compact("t")
                log.erase_keys("t", [b"no-such-key"])
            except Exception as e:  # noqa: BLE001
                maint_errors.append(f"{type(e).__name__}: {str(e)[:300]}")
                return
            i += 1
            time.sleep(0.05)

    mt = threading.Thread(target=maintenance)
    mt.start()
    try:
        # child A: drain loop; killed mid-flight after a few seconds
        child_a = subprocess.Popen(
            [sys.executable, "-c", _CHILD, root, "t", ckpt, out, "50"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        deadline = time.time() + 25
        while time.time() < deadline and not os.path.exists(out):
            time.sleep(0.5)  # wait for at least one delivered batch
        time.sleep(3)  # let it run hot against the maintenance loop
        child_a.send_signal(signal.SIGKILL)
        child_a.wait(timeout=60)

        # child B: resumes the same checkpoint, runs a few more drains
        child_b = subprocess.Popen(
            [sys.executable, "-c", _CHILD, root, "t", ckpt, out, "4"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        out_b, err_b = child_b.communicate(timeout=300)
        assert child_b.returncode == 0, f"child B failed:\n{err_b[-2000:]}"
        assert "CHILD_OK" in out_b
    finally:
        stop.set()
        mt.join(timeout=120)
    assert not maint_errors, f"maintenance loop failed: {maint_errors[0]}"

    # final drain from the parent session (third "restart"): catches
    # anything produced after child B's last pass
    spark.dataSource.register(TopicLogDataSource)

    def collect(df, bid):
        rows = df.select("partition", "offset").collect()
        with open(out, "a") as f:
            f.write(
                json.dumps(
                    {
                        "bid": bid,
                        "offsets": sorted([r["partition"], r["offset"]] for r in rows),
                    }
                )
                + "\n"
            )

    q = (
        spark.readStream.format("kcore_topic")
        .option("root", root)
        .option("topic", "t")
        .load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    per_bid, conflicts = _parse_deliveries(out)
    assert not conflicts, (
        f"a replayed batch id carried a different offset set: {conflicts[:2]}"
    )
    delivered: dict[tuple[int, int], int] = {}
    for offsets in per_bid.values():
        for k in offsets:
            delivered[k] = delivered.get(k, 0) + 1
    dups = {k: c for k, c in delivered.items() if c > 1}
    assert not dups, f"offsets delivered twice across batches: {list(dups)[:5]}"

    final = {
        (r["partition"], r["offset"])
        for r in log.scan("t").select("partition", "offset").collect()
    }
    assert final == set(delivered), (
        f"exactly-once broken: {len(final - set(delivered))} committed offsets "
        f"never delivered {sorted(final - set(delivered))[:5]}, "
        f"{len(set(delivered) - final)} delivered offsets not in the log "
        f"{sorted(set(delivered) - final)[:5]}"
    )
    assert len(final) == produced[0]

    tdir = log._topic_dir("t")
    debris = [
        d
        for d in os.listdir(tdir)
        if d.startswith(("data.old-", "data.compact.", "opt.", "data.part-old-"))
    ]
    assert debris == [], f"swap debris survived: {debris}"

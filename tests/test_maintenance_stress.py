"""Live reader-vs-maintenance stress for the r12 maintenance lock.

The ADVICE r11 race: a reader observing a healthy optimize()'s marker
window could "heal" the live writer — rmtree its staging dir or
restore a marker mid-delete — and two readers healing the same crash
raced each other's renames. tests/test_advice_r12.py pins the
mechanism with controlled windows; this suite runs the REAL
interleaving: maintenance ops looping on one thread while readers
hammer scan()/fetch() on others, with produces mixed in.

Contract under test (sources/topic_log.py): readers are lock-free and
get object-store visibility — a read planned before a swap MAY fail
with FILE_NOT_EXIST when the swap deletes the planned files first
(documented: "the same visibility a cloud object store gives"), and
the RETRY must succeed. What must NEVER happen:

- a retry that keeps failing (heal destroyed live maintenance state —
  the ADVICE scenario);
- a successful read with the wrong row count (torn log);
- a maintenance op failing because a reader healed under it;
- swap debris after the dust settles.
"""

from __future__ import annotations

import os
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog

# the documented object-store visibility class: a file/dir deleted by
# a swap between plan and read. Spark surfaces it as FILE_NOT_EXIST
# (Hadoop stream), NoSuchFileException under FAILED_READ_FILE.NO_HINT
# (NIO reader path), or PATH_NOT_FOUND at construction.
TRANSIENT = (
    "FILE_NOT_EXIST",
    "FileNotFoundException",
    "does not exist",
    "NoSuchFileException",
)


@pytest.fixture()
def log(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_maint_stress_") as d:
        yield TopicLog(spark, d)


def _records(spark, n, start=0):
    # UNIQUE keys: compaction keeps every record, so the reader-visible
    # row count is invariant across every maintenance op in the loop
    return spark.range(start, start + n).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


def _is_transient(exc: Exception) -> bool:
    return any(tok in str(exc) for tok in TRANSIENT)


def test_readers_survive_live_maintenance_loop(spark, log):
    log.create_topic("t", 2)
    # several small produces → enough segments that optimize always has
    # work and its marker window actually opens
    for i in range(4):
        log.produce("t", _records(spark, 8, start=8 * i), order_by=["seq"])
    expect = log.scan("t").count()
    assert expect == 32

    stop = threading.Event()
    fatal: list = []
    bad_counts: list = []
    transient_seen = [0]

    def read_with_retry(build, what):
        """One logical read: transient swap-visibility failures retry
        (bounded); a retry that keeps failing is the ADVICE bug."""
        last = None
        for _ in range(5):
            try:
                return build().count()
            except Exception as e:  # noqa: BLE001
                if not _is_transient(e):
                    raise
                transient_seen[0] += 1
                last = e
        raise AssertionError(f"{what}: retry never recovered: {last}")

    def reader():
        while not stop.is_set():
            try:
                n = read_with_retry(lambda: log.scan("t"), "scan")
                if n != expect:
                    bad_counts.append(n)
                got = read_with_retry(lambda: log.fetch("t", 0, 0, 1000), "fetch")
                if got == 0:
                    bad_counts.append(("fetch-empty", got))
            except Exception as e:  # noqa: BLE001 - the regression under test
                fatal.append(f"{type(e).__name__}: {str(e)[:400]}")
                return

    readers = [threading.Thread(target=reader) for _ in range(3)]
    for t in readers:
        t.start()
    try:
        # maintenance loop: every op that opens a swap/marker window.
        # These must never fail — a reader healing under a live swap
        # broke exactly here (staging dir rmtree'd, rename ENOTEMPTY).
        for round_i in range(3):
            log.optimize("t", target_bytes=512 * 1024 * 1024)
            log.compact("t")
            log.erase_keys("t", [b"no-such-key"])
            # churn the layout again so the next optimize has work;
            # readers compare against a moving target, so pause them
            # across the count change
            stop.set()
            for t in readers:
                t.join(timeout=60)
            assert not fatal, f"reader raised during maintenance: {fatal[0]}"
            log.produce(
                "t", _records(spark, 4, start=1000 + 4 * round_i), order_by=["seq"]
            )
            expect += 4
            stop.clear()
            readers = [threading.Thread(target=reader) for _ in range(3)]
            for t in readers:
                t.start()
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=60)

    assert not fatal, f"reader raised during maintenance: {fatal[0]}"
    assert not bad_counts, f"reader saw a torn log: {bad_counts[:3]}"
    tdir = log._topic_dir("t")
    debris = [
        d
        for d in os.listdir(tdir)
        if d.startswith(("data.old-", "data.compact.", "opt.", "data.part-old-"))
    ]
    assert debris == [], f"swap debris survived the loop: {debris}"
    assert log.scan("t").count() == expect

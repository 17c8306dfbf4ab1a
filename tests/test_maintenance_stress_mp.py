"""Cross-PROCESS maintenance-vs-reader stress (the flock half of the
r12 maintenance-lock fix).

tests/test_maintenance_stress.py proves the in-process interleaving;
this suite proves the locks do their job ACROSS processes: a child
Python process with its own SparkSession loops
optimize()/compact()/erase_keys() on a shared topic root while the
parent session's readers hammer scan()/fetch(). The maintenance lock,
flip lock, and partition commit locks are all advisory flocks, so
this is the deployment shape (several Spark drivers over one shared
log directory).

Invariants (same as the in-process suite):
- transient missing-file reads (the documented object-store class)
  retry and recover; a retry that keeps failing means a reader healed
  over the child's live swap;
- every successful read returns the complete log;
- the child's maintenance loop itself never fails;
- no swap debris when both sides are done.

Marked slow: spawning the child JVM costs ~20s.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import textwrap
import threading

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog

TRANSIENT = (
    "FILE_NOT_EXIST",
    "FileNotFoundException",
    "does not exist",
    "NoSuchFileException",
)

_CHILD = textwrap.dedent(
    """
    import sys
    root, rounds = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from kcore_spark.sources.topic_log import TopicLog

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("maintenance-b")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    log = TopicLog(spark, root)
    for _ in range(rounds):
        log.optimize("t", target_bytes=512 * 1024 * 1024)
        log.compact("t")
        log.erase_keys("t", [b"no-such-key"])
    print("CHILD_OK")
    spark.stop()
    """
)


@pytest.mark.slow
def test_cross_process_maintenance_vs_readers(spark):
    root = tempfile.mkdtemp(prefix="kcore_mp_maint_")
    log = TopicLog(spark, root)
    log.create_topic("t", 2)
    for i in range(4):
        log.produce(
            "t",
            spark.range(8 * i, 8 * i + 8).select(
                F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
                F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
                F.col("id").alias("seq"),
            ),
            order_by=["seq"],
        )
    expect = log.scan("t").count()
    assert expect == 32

    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD, root, "3"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )

    stop = threading.Event()
    fatal: list = []
    bad: list = []

    def read_with_retry(build, what):
        last = None
        for _ in range(5):
            try:
                return build().count()
            except Exception as e:  # noqa: BLE001
                if not any(t in str(e) for t in TRANSIENT):
                    raise
                last = e
        raise AssertionError(f"{what}: retry never recovered: {last}")

    def reader():
        while not stop.is_set():
            try:
                n = read_with_retry(lambda: log.scan("t"), "scan")
                if n != expect:
                    bad.append(n)
                got = read_with_retry(lambda: log.fetch("t", 0, 0, 1000), "fetch")
                if got == 0:
                    bad.append(("fetch-empty", got))
            except Exception as e:  # noqa: BLE001
                fatal.append(f"{type(e).__name__}: {str(e)[:400]}")
                return

    readers = [threading.Thread(target=reader) for _ in range(2)]
    for t in readers:
        t.start()
    try:
        out, err = child.communicate(timeout=300)
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=60)

    assert child.returncode == 0, f"child maintenance failed:\n{err[-2000:]}"
    assert "CHILD_OK" in out
    assert not fatal, f"reader raised during cross-process maintenance: {fatal[0]}"
    assert not bad, f"reader saw a torn log: {bad[:3]}"
    tdir = log._topic_dir("t")
    debris = [
        d
        for d in os.listdir(tdir)
        if d.startswith(("data.old-", "data.compact.", "opt.", "data.part-old-"))
    ]
    assert debris == [], f"swap debris survived: {debris}"
    assert log.scan("t").count() == expect

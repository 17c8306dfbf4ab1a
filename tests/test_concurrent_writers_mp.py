"""Cross-PROCESS concurrent writers on one topic (r13).

tests/test_concurrent_writers.py stresses the per-partition commit
locks with threads and argues flock's per-open-file-description
semantics make threads equivalent to processes — but in-process the
thread mutate lock (`@_locked`) serializes ABOVE the filesystem
protocol, so the flock/flip-lock/watermark-RMW machinery never truly
races within one process. This suite removes that safety net: two
child Python processes (own SparkSessions, own TopicLog instances)
produce interleaved batches to the SAME topic — one pair targeting
the same partitions, one pair disjoint — while the parent's reader
polls scans.

Invariants:
- every child's every batch is acknowledged (no lost produce);
- final offsets are DENSE per partition: 0..hw-1 with no gaps and no
  duplicates (the watermark read-modify-write under the flip lock is
  the contended path);
- total row count equals the sum of all produced batches;
- the manifest resolves every committed offset (fetch of the full
  range succeeds);
- parent-side scans during the run never raise outside the documented
  transient class.

Marked slow: two child JVMs cost ~40s.
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
    "PATH_NOT_FOUND",
)

_CHILD = textwrap.dedent(
    """
    import sys
    root, tag, n_batches, rows_per = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F
    from kcore_spark.sources.topic_log import TopicLog

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("writer-" + tag)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    log = TopicLog(spark, root)
    for i in range(n_batches):
        # default keyed partitioning: both children hash into the SAME
        # partitions — the fully contended path (watermark RMW under
        # the flip lock + per-partition commit flocks across processes)
        df = spark.range(rows_per).select(
            F.encode(F.concat(F.lit(tag + "-" + str(i) + "-"),
                              F.col("id").cast("string")), "utf-8").alias("key"),
            F.encode(F.concat(F.lit(tag), F.col("id").cast("string")), "utf-8").alias("value"),
            F.col("id").alias("seq"),
        )
        log.produce("w", df, order_by=["seq"])
    print("CHILD_OK " + tag)
    spark.stop()
    """
)


@pytest.mark.slow
def test_cross_process_writers_dense_offsets(spark):
    root = tempfile.mkdtemp(prefix="kcore_mp_writers_")
    log = TopicLog(spark, root)
    log.create_topic("w", 3)
    # seed one batch so readers always have something
    log.produce(
        "w",
        spark.range(3).select(
            F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
            F.col("id").alias("seq"),
        ),
        order_by=["seq"],
    )

    n_batches, rows_per = 4, 6
    children = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, root, f"w_{tag}", str(n_batches), str(rows_per)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for tag in ("a", "b")
    ]

    stop = threading.Event()
    fatal: list = []

    def reader():
        while not stop.is_set():
            try:
                log.scan("w").count()
            except Exception as e:  # noqa: BLE001
                if not any(t in str(e) for t in TRANSIENT):
                    fatal.append(f"{type(e).__name__}: {str(e)[:300]}")
                    return

    rt = threading.Thread(target=reader)
    rt.start()
    try:
        outs = [c.communicate(timeout=300) for c in children]
    finally:
        stop.set()
        rt.join(timeout=60)

    for c, (out, err) in zip(children, outs):
        assert c.returncode == 0, f"writer child failed:\n{err[-2000:]}"
        assert "CHILD_OK" in out
    assert not fatal, f"reader raised during concurrent writes: {fatal[0]}"

    total = 3 + 2 * n_batches * rows_per
    rows = log.scan("w").select("partition", "offset", "value").collect()
    assert len(rows) == total, f"lost rows: {len(rows)} != {total}"
    # dense offsets per partition, no duplicates
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    wm = log._watermarks("w")
    for p, offs in by_part.items():
        offs.sort()
        assert offs == list(range(len(offs))), (
            f"partition {p} offsets not dense: {offs[:10]}..."
        )
        assert wm[p] == len(offs), f"watermark {wm[p]} != {len(offs)} on p{p}"
    # the manifest resolves the full committed range per partition
    for p, offs in by_part.items():
        got = log.fetch("w", p, 0, 10_000).count()
        assert got == len(offs), f"fetch p{p}: {got} != {len(offs)}"

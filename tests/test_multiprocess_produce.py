"""Two-PROCESS produce safety: a second Python process with its own
SparkSession produces into the same topic root while this session
produces too. The cross-process flock (topic_commit_lock) must
serialize the read-watermark → assign → flip sequences so offsets
stay dense and unique — the failure mode without it is both writers
assigning from the same base watermark (duplicate offsets) or one
os.replace clobbering the other's flip (invisible records)."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import textwrap

from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog

_CHILD = textwrap.dedent(
    """
    import sys
    root, n = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F
    from kcore_spark.sources.topic_log import TopicLog

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("producer-b")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    log = TopicLog(spark, root)
    for batch in range(4):
        log.produce(
            "t",
            spark.range(n).select(
                F.encode(F.lit("B").cast("string"), "utf-8").alias("key"),
                F.encode(
                    F.concat(F.lit(f"b{batch}-"), F.col("id").cast("string")), "utf-8"
                ).alias("value"),
                F.col("id").alias("seq"),
            ),
            partition_expr=F.lit(0),
            order_by=["seq"],
        )
    print("CHILD_OK")
    spark.stop()
    """
)


def test_two_process_produce_keeps_offsets_dense(spark):
    root = tempfile.mkdtemp(prefix="kcore_mp_")
    log = TopicLog(spark, root)
    log.create_topic("t", 1)
    n = 25
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD, root, str(n)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    try:
        # produce from THIS session while the child's batches land
        for batch in range(4):
            log.produce(
                "t",
                spark.range(n).select(
                    F.encode(F.lit("A"), "utf-8").alias("key"),
                    F.encode(
                        F.concat(F.lit(f"a{batch}-"), F.col("id").cast("string")),
                        "utf-8",
                    ).alias("value"),
                    F.col("id").alias("seq"),
                ),
                partition_expr=F.lit(0),
                order_by=["seq"],
            )
        out, _ = child.communicate(timeout=300)
        assert b"CHILD_OK" in out, "child producer failed"
    finally:
        if child.poll() is None:
            child.kill()
    rows = log.scan("t").orderBy("offset").collect()
    total = 8 * n  # 4 batches from each side
    # dense, duplicate-free offsets: the commit-lock contract
    assert [r.offset for r in rows] == list(range(total))
    # no record lost from either writer
    values = [bytes(r.value).decode() for r in rows]
    assert sum(1 for v in values if v.startswith("a")) == 4 * n
    assert sum(1 for v in values if v.startswith("b")) == 4 * n
    # every batch arrived intact (25 contiguous seqs each, any interleave)
    wm = log._watermarks("t")
    assert wm == {0: total}


# ------------------------------------------------- per-partition parallelism

_CHILD_P1 = textwrap.dedent(
    """
    import sys
    root, n = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F
    from kcore_spark.sources.topic_log import TopicLog

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("producer-p1")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    log = TopicLog(spark, root)
    log.produce(
        "t2",
        spark.range(n).select(
            F.encode(F.lit("B"), "utf-8").alias("key"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
            F.col("id").alias("seq"),
        ),
        partition_expr=F.lit(1),
        order_by=["seq"],
        partitions=[1],
    )
    print("CHILD_OK")
    spark.stop()
    """
)


def test_disjoint_partition_produce_is_parallel(spark):
    """Kafka's unit of write concurrency is the partition (r6 VERDICT
    #4): while THIS process holds partition 0's commit lock — exactly
    what an in-flight p0 produce holds — a child process must complete
    an entire produce (Spark job included) into partition 1 of the
    same topic. Under the old per-topic flock the child would block
    until the lock was released and the timeout below would fire."""
    from kcore_spark.sources.topic_log import TopicLog, partition_commit_locks

    root = tempfile.mkdtemp(prefix="kcore_mp2_")
    log = TopicLog(spark, root)
    log.create_topic("t2", 2)
    n = 25
    tdir = os.path.join(root, "t2")
    with partition_commit_locks(tdir, [0]):
        child = subprocess.Popen(
            [sys.executable, "-c", _CHILD_P1, root, str(n)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        try:
            out, _ = child.communicate(timeout=300)
        finally:
            if child.poll() is None:
                child.kill()
        assert b"CHILD_OK" in out, (
            "child produce to partition 1 did not complete while "
            "partition 0's lock was held"
        )
    # the parallel commit is fully visible and dense
    rows = log.scan("t2").where(F.col("partition") == 1).orderBy("offset").collect()
    assert [r.offset for r in rows] == list(range(n))
    assert log._watermarks("t2") == {0: 0, 1: n}


def test_declared_partition_set_enforced_in_plan(spark):
    """A record routed outside the declared partition set must fail the
    write job before anything commits — the declaration is what makes
    taking only those partitions' locks safe."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    from kcore_spark.sources.topic_log import TopicLog

    root = tempfile.mkdtemp(prefix="kcore_mp3_")
    log = TopicLog(spark, root)
    log.create_topic("t3", 2)
    recs = spark.range(4).select(
        F.encode(F.lit("k"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception)):
        log.produce("t3", recs, partition_expr=F.lit(1), order_by=["seq"], partitions=[0])
    # nothing committed — not even a data dir (the raise_error guard
    # fails the job before any file lands)
    assert log._watermarks("t3") == {0: 0, 1: 0}
    data_dir = os.path.join(root, "t3", "data")
    assert not os.path.isdir(data_dir) or not any(
        f for _, _, fs in os.walk(data_dir) for f in fs if f.endswith(".parquet")
    )


def test_concurrent_disjoint_produce_same_process_loses_nothing(spark):
    """r7 regression: two THREADS producing to disjoint partitions of
    one topic concurrently (separate TopicLog instances — flocks do
    not exclude within a process holding different partitions). The
    naive mode('append') write shared the Hadoop committer's
    _temporary staging under the topic's data dir, and one job's
    commit wiped the other's files (measured: partition 1 vanished
    entirely). The staged-write-then-rename path must land BOTH."""
    import threading

    from kcore_spark.sources.topic_log import TopicLog

    root = tempfile.mkdtemp(prefix="kcore_thr_")
    log_a = TopicLog(spark, root)
    log_a.create_topic("t", 2)
    log_b = TopicLog(spark, root)
    n = 5000
    errs = []

    def produce(lg, tag, p):
        try:
            lg.produce(
                "t",
                spark.range(n).select(
                    F.encode(F.lit(tag), "utf-8").alias("key"),
                    F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
                    F.col("id").alias("seq"),
                ),
                partition_expr=F.lit(p),
                order_by=["seq"],
                partitions=[p],
            )
        except Exception as e:  # surface thread failures to the assert
            errs.append(e)

    ts = [
        threading.Thread(target=produce, args=(log_a, "a", 0)),
        threading.Thread(target=produce, args=(log_b, "b", 1)),
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert errs == []
    assert log_a._watermarks("t") == {0: n, 1: n}
    per_part = {
        r["partition"]: r["count"]
        for r in log_a.scan("t").groupBy("partition").count().collect()
    }
    assert per_part == {0: n, 1: n}
    # offsets dense in both partitions
    for p in (0, 1):
        offs = [
            r.offset
            for r in log_a.scan("t").where(F.col("partition") == p).orderBy("offset").collect()
        ]
        assert offs == list(range(n))

"""kcore_topic Python DataSource (sources/pyds.py): planning and read
parity with the native TopicLog fetch path."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kcore_spark.sources.pyds import TopicLogDataSource, TopicLogReader
from kcore_spark.sources.topic_log import TopicLog


def _make_log(spark, n=100, parts=3):
    root = tempfile.mkdtemp(prefix="kcore_pyds_")
    log = TopicLog(spark, root)
    log.create_topic("t", parts)
    recs = spark.range(0, n).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode((F.col("id") * 7).cast("string"), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )
    log.produce("t", recs, order_by=["seq"])
    log.produce("t", recs, order_by=["seq"])  # second batch → more segments
    return log


def test_full_read_matches_native_fetch(spark):
    log = _make_log(spark)
    spark.dataSource.register(TopicLogDataSource)
    via_ds = (
        spark.read.format("kcore_topic")
        .option("root", log.root)
        .option("topic", "t")
        .load()
        .select("partition", "offset", "key", "value")
    )
    native = [
        log.fetch("t", p, 0, 10_000).select("partition", "offset", "key", "value")
        for p in range(3)
    ]
    native_all = native[0].unionByName(native[1]).unionByName(native[2])
    a = sorted(map(tuple, via_ds.collect()))
    b = sorted(map(tuple, native_all.collect()))
    assert a == b and len(a) == 200


def test_offset_range_filters_and_prunes(spark):
    log = _make_log(spark)
    spark.dataSource.register(TopicLogDataSource)
    sub = (
        spark.read.format("kcore_topic")
        .option("root", log.root)
        .option("topic", "t")
        .option("start_offset", "5")
        .option("end_offset", "15")
        .load()
    )
    rows = sub.collect()
    assert all(5 <= r.offset < 15 for r in rows)
    assert len(rows) == 30  # 10 offsets × 3 partitions

    # manifest-based planning prunes whole segments outside the range:
    # the second produce's segments hold offsets >= ~33 per partition,
    # so a [0, 5) read must plan strictly fewer splits than a full read
    full_splits = TopicLogReader({"root": log.root, "topic": "t"}).partitions()
    low_splits = TopicLogReader(
        {"root": log.root, "topic": "t", "start_offset": "0", "end_offset": "5"}
    ).partitions()
    assert 0 < len(low_splits) < len(full_splits)


def test_empty_topic_reads_zero_rows(spark):
    root = tempfile.mkdtemp(prefix="kcore_pyds_empty_")
    log = TopicLog(spark, root)
    log.create_topic("empty", 2)
    spark.dataSource.register(TopicLogDataSource)
    df = (
        spark.read.format("kcore_topic")
        .option("root", root)
        .option("topic", "empty")
        .load()
    )
    assert df.count() == 0
    assert len(df.schema.fields) == 7


def test_stream_reader_incremental_across_runs(spark):
    import tempfile as tf

    from pyspark.sql import functions as F2

    log = _make_log(spark, n=60)
    spark.dataSource.register(TopicLogDataSource)
    ckpt = tf.mkdtemp(prefix="kcore_pyds_ckpt_")
    sink = tf.mkdtemp(prefix="kcore_pyds_sink_") + "/out"

    def run_once():
        q = (
            spark.readStream.format("kcore_topic")
            .option("root", log.root)
            .option("topic", "t")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(sink).count()
    assert first == 120  # two produces of 60

    # new records arrive; the SAME checkpoint must pick up ONLY them
    recs = spark.range(1000, 1010).select(
        F2.encode(F2.col("id").cast("string"), "utf-8").alias("key"),
        F2.encode(F2.col("id").cast("string"), "utf-8").alias("value"),
        F2.col("id").alias("seq"),
    )
    log.produce("t", recs, order_by=["seq"])
    run_once()
    df = spark.read.parquet(sink)
    assert df.count() == 130
    # every (partition, offset) appears exactly once — no replay dups
    assert df.select("partition", "offset").distinct().count() == 130


def test_hostile_options_fail_cleanly(spark):
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    spark.dataSource.register(TopicLogDataSource)
    # unknown topic: planning fails with a clear error, not a hang
    with _pytest.raises(Exception) as ei:
        (
            spark.read.format("kcore_topic")
            .option("root", "/nonexistent_kcore_root")
            .option("topic", "ghost")
            .load()
            .collect()
        )
    assert "ghost" in str(ei.value) or "No such file" in str(ei.value)


def test_corrupt_manifest_falls_back_to_listing(spark):
    # a manifest that isn't JSON must not poison reads — note this is
    # stricter than the native path (which heals via refresh): the
    # DataSource treats an unreadable manifest as absent
    import os

    log = _make_log(spark, n=30)
    with open(os.path.join(log.root, "t", "_manifest.json"), "w") as f:
        f.write("{ not json")
    spark.dataSource.register(TopicLogDataSource)
    df = (
        spark.read.format("kcore_topic")
        .option("root", log.root)
        .option("topic", "t")
        .load()
    )
    assert df.count() == 60


# ---------------------------------------------------- batch writer


def test_writer_roundtrip_two_phase(spark):
    """df.write.format('kcore_topic') stages on executors, sequences
    through TopicLog.produce on commit — offsets dense per partition
    in seq order, staging cleared, data identical to the native path."""
    import glob
    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="kcore_pyds_w_")
    log = TopicLog(spark, root)
    log.create_topic("w", 2)
    spark.dataSource.register(TopicLogDataSource)
    df = spark.range(0, 50).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode((F.col("id") * 3).cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(1_700_000_000_000) + F.col("id")).alias("timestamp"),
        (F.col("id") % 2).cast("int").alias("part"),
        F.col("id").alias("seq"),
    ).repartition("part")  # one staged file per partition → exact seq order
    (
        df.write.format("kcore_topic")
        .option("root", root)
        .option("topic", "w")
        .mode("append")
        .save()
    )
    # staging cleared after commit
    assert not glob.glob(os.path.join(root, "w", "_staging", "*"))
    # dense offsets per partition, ordered by seq
    out = log.scan("w").select("partition", "offset", "key").collect()
    by_part = {}
    for r in sorted(out, key=lambda r: (r["partition"], r["offset"])):
        by_part.setdefault(r["partition"], []).append(int(r["key"].decode()))
    assert sorted(by_part) == [0, 1]
    for p, ids in by_part.items():
        assert ids == sorted(ids)  # seq order preserved
        assert len(ids) == 25
    # offsets are dense 0..24 in each partition
    offs = {}
    for r in out:
        offs.setdefault(r["partition"], []).append(r["offset"])
    for p in (0, 1):
        assert sorted(offs[p]) == list(range(25))
    # a second write APPENDS at the watermark
    (
        df.limit(4).write.format("kcore_topic")
        .option("root", root).option("topic", "w").mode("append").save()
    )
    lo = {r["partition"]: r["next_offset"] for r in log.list_offsets("w").collect()}
    assert sum(lo.values()) == 54


def test_writer_rejects_overwrite_and_bad_schema(spark):
    import tempfile

    import pytest

    root = tempfile.mkdtemp(prefix="kcore_pyds_w2_")
    log = TopicLog(spark, root)
    log.create_topic("w", 1)
    spark.dataSource.register(TopicLogDataSource)
    df = spark.range(3).select(F.col("id").alias("seq"))
    with pytest.raises(Exception, match="append-only|not supported"):
        (
            df.write.format("kcore_topic")
            .option("root", root).option("topic", "w")
            .mode("overwrite").save()
        )
    with pytest.raises(Exception, match="missing"):
        (
            df.write.format("kcore_topic")
            .option("root", root).option("topic", "w")
            .mode("append").save()
        )


def test_writer_multitask_dense_and_manifest_pruned(spark):
    """Many writer tasks per partition: offsets stay dense per
    partition (file order by min_seq), the manifest indexes the new
    segments (fetch's pruned path sees them), and a kcore_topic READ
    of the written topic round-trips."""
    import tempfile

    root = tempfile.mkdtemp(prefix="kcore_pyds_w3_")
    log = TopicLog(spark, root)
    log.create_topic("m", 2)
    spark.dataSource.register(TopicLogDataSource)
    df = spark.range(0, 80).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(1_700_000_000_000) + F.col("id")).alias("timestamp"),
        (F.col("id") % 2).cast("int").alias("part"),
        F.col("id").alias("seq"),
    ).repartition(5)  # several tasks stage files for BOTH partitions
    (
        df.write.format("kcore_topic")
        .option("root", root).option("topic", "m").mode("append").save()
    )
    for p in (0, 1):
        # manifest-pruned fetch sees every offset, densely
        got = sorted(r["offset"] for r in log.fetch("m", p, 0, 1000).collect())
        assert got == list(range(40))
    # reading back through the DataSource matches the native scan
    via_ds = (
        spark.read.format("kcore_topic")
        .option("root", root).option("topic", "m").load()
    )
    assert via_ds.count() == 80
    native_keys = {bytes(r["key"]) for r in log.scan("m").collect()}
    ds_keys = {bytes(r["key"]) for r in via_ds.collect()}
    assert ds_keys == native_keys
    # a snapshot version was recorded by the write commit
    assert [v for v, _ in log.snapshot_versions("m")] == [1]


def test_writer_unknown_topic_fails_before_publishing(spark):
    """A write to a topic that was never created must fail at commit
    (no _meta.json) and leave NOTHING visible — no data dir, no
    watermark flip."""
    import os
    import tempfile

    import pytest

    root = tempfile.mkdtemp(prefix="kcore_pyds_w4_")
    spark.dataSource.register(TopicLogDataSource)
    df = spark.range(3).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(1_700_000_000_000)).alias("timestamp"),
        F.lit(0).cast("int").alias("part"),
        F.col("id").alias("seq"),
    )
    with pytest.raises(Exception, match="ghost|No such file|meta"):
        (
            df.write.format("kcore_topic")
            .option("root", root).option("topic", "ghost").mode("append").save()
        )
    assert not os.path.isdir(os.path.join(root, "ghost", "data"))


def test_writer_rejects_out_of_range_partition(spark):
    """Rows targeting a partition the topic does not declare must fail
    the COMMIT atomically: the valid rows of the same batch must not
    be half-published."""
    import tempfile

    import pytest

    root = tempfile.mkdtemp(prefix="kcore_pyds_w5_")
    log = TopicLog(spark, root)
    log.create_topic("t", 2)
    spark.dataSource.register(TopicLogDataSource)
    df = spark.range(4).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(1_700_000_000_000)).alias("timestamp"),
        (F.col("id") % 5).cast("int").alias("part"),  # partitions 0..4 vs declared 2
        F.col("id").alias("seq"),
    )
    with pytest.raises(Exception, match="declares 2 partitions|partition"):
        (
            df.write.format("kcore_topic")
            .option("root", root).option("topic", "t").mode("append").save()
        )
    # nothing became visible — watermarks still at zero, no segments
    import os

    assert all(v == 0 for v in log._watermarks("t").values())
    data_dir = os.path.join(root, "t", "data")
    assert not os.path.isdir(data_dir) or not any(
        f.endswith(".parquet")
        for _, _, files in os.walk(data_dir)
        for f in files
    )


def test_stream_reader_max_offsets_per_trigger(spark, tmp_path):
    """Backpressure: a deep log is consumed in bounded micro-batches
    (total offsets per trigger ≤ the cap, spread across partitions),
    and the union of all batches equals the whole log."""
    import pyspark.sql.functions as F

    from kcore_spark.sources.pyds import TopicLogStreamReader
    from kcore_spark.sources.topic_log import TopicLog

    root = str(tmp_path / "logs")
    log = TopicLog(spark, root)
    log.create_topic("deep", 2)
    log.produce(
        "deep",
        spark.range(40).select(
            F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
            F.col("id").alias("seq"),
        ),
        partition_expr=(F.col("seq") % 2).cast("int"),
        order_by=["seq"],
    )
    rdr = TopicLogStreamReader(
        {"root": root, "topic": "deep", "max_offsets_per_trigger": "12"}
    )
    pos = rdr.initialOffset()
    seen = []
    batches = 0
    while True:
        rows, end = rdr.read(pos)
        if end == pos:
            break
        advanced = sum(int(end[p]) - int(pos.get(p, 0)) for p in end)
        assert advanced <= 12
        seen.extend(rows)
        pos = end
        batches += 1
        assert batches < 50, "did not converge"
    assert batches >= 4  # 40 offsets / 12 per trigger
    assert len(seen) == 40
    # both partitions advanced every full batch (proportional split)
    assert {int(p) for p in pos} == {0, 1}
    assert all(int(v) == 20 for v in pos.values())

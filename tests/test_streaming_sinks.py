"""Streaming sink surface: foreachBatch incremental upsert across
REAL multiple micro-batches (maxFilesPerTrigger=1 over a multi-file
source), checked against the batch answer."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from .conftest import SF_DIR_MED


def test_foreach_batch_upsert_latest_event_per_user(spark):
    src_dir = tempfile.mkdtemp(prefix="kcore_multi_src_")
    state_dir = tempfile.mkdtemp(prefix="kcore_upsert_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="kcore_ckpt_fb_")

    from kcore_spark.catalog import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{SF_DIR_MED}/events.parquet"))
    # 3 source files → 3 micro-batches with maxFilesPerTrigger=1
    ev.repartition(3).write.mode("overwrite").parquet(src_dir + "/files")

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir + "/files").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/files")
    )

    batches = []

    def upsert(batch_df, batch_id):
        batches.append(batch_id)
        incoming = batch_df.select("user_id", "event_id", "ts", "event_type")
        if os.path.isdir(state_dir):
            current = batch_df.sparkSession.read.parquet(state_dir)
            merged = current.unionByName(incoming)
        else:
            merged = incoming
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        latest = merged.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
        # write-then-swap for idempotent replay
        tmp_out = state_dir + ".next"
        latest.write.mode("overwrite").parquet(tmp_out)
        import shutil

        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp_out, state_dir)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(batches) == 3, f"expected 3 micro-batches, got {batches}"
    got = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(state_dir).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = {
        r["user_id"]: r["event_id"]
        for r in ev.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    assert got == want

"""Stream-processor shape (Kafka Streams analog): consume one topic as
a stream, transform, produce the result into another topic — all on
the engine's own topic logs, with offsets assigned by the sink
produce. Plus: incremental dedup composition across batches using
persisted MinHash signatures (the contract claimed in
operators/dedup.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog

from .conftest import SF_DIR_MED


def test_topic_to_topic_stream_pipeline(spark):
    root = tempfile.mkdtemp(prefix="kcore_sp_")
    log = TopicLog(spark, root)
    log.create_topic("raw", 2)
    log.create_topic("purchases", 2)

    from kcore_spark.catalog import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{SF_DIR_MED}/events.parquet"))
    records = ev.select(
        F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.to_json(F.struct("event_id", "event_type", "value")), "utf-8").alias("value"),
        F.col("ts").alias("timestamp"),
        "event_id",
    )
    log.produce("raw", records, order_by=["event_id"])

    # stream processor: raw → filter purchases → re-key → purchases topic
    ckpt = tempfile.mkdtemp(prefix="kcore_sp_ckpt_")

    def process(batch_df, batch_id):
        parsed = batch_df.select(
            "key",
            "value",
            "timestamp",
            F.get_json_object(F.decode("value", "utf-8"), "$.event_type").alias("etype"),
            F.get_json_object(F.decode("value", "utf-8"), "$.event_id").cast("long").alias("eid"),
        )
        purchases = parsed.where(F.col("etype") == "purchase").select(
            "key", "value", "timestamp", F.col("eid")
        )
        if purchases.head(1):
            log.produce("purchases", purchases, order_by=["eid"])

    q = (
        log.read_stream("raw")
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # sink topic has exactly the purchase events, dense offsets per partition
    n_purchases = ev.where("event_type = 'purchase'").count()
    sunk = log.scan("purchases")
    assert sunk.count() == n_purchases
    per_part = sunk.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi")
    )
    for r in per_part.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    # payloads survive the hop byte-for-byte
    one = sunk.select(F.decode("value", "utf-8").alias("v")).first()["v"]
    assert '"event_type":"purchase"' in one


def test_incremental_minhash_dedup(spark):
    """Signatures computed in run 1, persisted, then composed with a
    second batch in run 2 — portable hashing makes them compatible."""
    from kcore_spark.operators.dedup import minhash_signatures, word_shingles

    store = tempfile.mkdtemp(prefix="kcore_sigs_") + "/sigs"
    docs = spark.read.parquet(f"{SF_DIR_MED}/documents.parquet")
    batch1 = docs.where("doc_id < 250")
    batch2 = docs.where("doc_id >= 250")

    # run 1: sign batch1 and persist
    minhash_signatures(word_shingles(batch1, "doc_id", "text"), 6).write.parquet(store)

    # run 2 (conceptually a new day): sign only batch2, union with stored
    sigs2 = minhash_signatures(word_shingles(batch2, "doc_id", "text"), 6)
    combined = spark.read.parquet(store).unionByName(sigs2)

    # equivalence: identical to signing everything at once
    full = minhash_signatures(word_shingles(docs, "doc_id", "text"), 6)
    a = sorted(map(tuple, combined.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b

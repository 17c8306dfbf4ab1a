"""Streaming helpers: deterministic availableNow replay to a memory sink.

Every streaming query in the inventory runs with
``trigger(availableNow=True)`` + a fresh checkpoint, which processes
the whole source once and terminates — the streaming answer equals the
batch answer, which is what lets the DuckDB oracle check streaming
operators at all (SURVEY §5).

In production the same pipelines run with a real trigger; nothing in
the query shape changes — availableNow vs processingTime is a replay
policy, not a semantics change.

Provenance: SURVEY §2.3-I / §5 (availableNow determinism is our test
strategy extension; the reference has no streaming execution at all).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


_STAGED: dict[str, str] = {}


def _staged_events_dir(sf_dir: str) -> str:
    """The parquet file-stream source requires a directory; stage the
    single events.parquet file behind a symlink once per sf_dir."""
    if sf_dir not in _STAGED:
        d = tempfile.mkdtemp(prefix="kcore_events_stream_")
        os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet"))
        _STAGED[sf_dir] = d
    return _STAGED[sf_dir]


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture with the engine's type
    normalization (any fixture ts encoding → session-TZ timestamp),
    sharing catalog.normalize_event_ts with the batch path so batch and
    stream can never disagree about the event-time type."""
    from kcore_spark.catalog import ensure_engine_confs, normalize_event_ts

    ensure_engine_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(static.schema).parquet(_staged_events_dir(sf_dir))
    return normalize_event_ts(stream)


def run_to_table(
    stream_df: DataFrame,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the materialized result as a batch DataFrame.

    state_partitions sizes the stateful-operator layout: a streaming
    agg's state partition count is pinned by the FIRST run's shuffle
    partitions, and every trigger re-opens one state store per
    partition — so the count should follow state volume, not the batch
    shuffle default. These pipelines carry small keyed state (windowed
    aggs over hours×types), where 32 stores per trigger is pure setup
    overhead: 8 measures ~1.6× faster cold at sf0.1 with identical
    results. A 100 TB deployment sizes this up with state volume
    (spark.sql.shuffle.partitions at first checkpoint creation). Pass
    None to inherit the session setting unchanged."""
    spark = stream_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="kcore_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def run_to_table_with_ckpt(
    stream_df: DataFrame,
    checkpoint_dir: str,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Like run_to_table but against a PERSISTENT checkpoint: the first
    availableNow run processes the whole source; each later run with
    the same checkpoint processes only newly-appeared files and folds
    them into the recovered state. This is the per-trigger cost a
    production pipeline pays, as opposed to run_to_table's
    cold-replay-everything cost — the bench reports both."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_incremental(
    stream_df: DataFrame,
    checkpoint_dir: str,
    sink_dir: str,
) -> None:
    """Incremental availableNow run against a PERSISTENT checkpoint:
    the first run processes the whole source, every later run processes
    only files that appeared since — Structured Streaming's resume
    contract, which is exactly a Kafka consumer group's position
    tracking with the checkpoint playing __consumer_offsets.

    Append-only parquet sink (projections/filters/joins); aggregations
    need foreachBatch upsert instead (streaming/sinks.py). The pair
    (checkpoint_dir, sink_dir) must move together — reusing a
    checkpoint against a truncated sink double-counts nothing but
    leaves stale rows behind.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_CHUNKED: dict[tuple[str, int], str] = {}


def events_stream_chunked(spark: SparkSession, sf_dir: str, n_chunks: int = 6) -> DataFrame:
    """readStream over the events fixture split into ``n_chunks``
    CHRONOLOGICAL files consumed one per micro-batch
    (maxFilesPerTrigger=1, ascending mtimes) — the staging that makes
    event-time semantics observable: watermarks advance batch by
    batch, so state timeouts actually fire mid-stream instead of the
    whole fixture arriving as one batch. Chunks are time-partitioned
    (chunk i holds an ntile of the time-sorted events), so the
    watermark is monotone across batches."""
    import shutil as _shutil
    import time as _time

    from kcore_spark.catalog import ensure_engine_confs, normalize_event_ts

    ensure_engine_confs(spark)
    key = (sf_dir, n_chunks)
    if key not in _CHUNKED:
        d = tempfile.mkdtemp(prefix="kcore_events_chunks_")
        static = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        # Chronological chunk assignment WITHOUT a single-task global
        # window (the former ntile-over-everything sort, re-run once
        # per chunk, dominated staging cost): exact ts quantile
        # boundaries from one aggregate, then a fully parallel
        # comparison against the broadcast boundary list. Boundary
        # ties all land in the lower chunk — deterministic, and chunk
        # PLACEMENT can't change results: chunks stay time-ordered, so
        # the watermark is monotone and nothing ever arrives late.
        qfracs = ", ".join(str(i / n_chunks) for i in range(1, n_chunks))
        bounds = static.agg(
            F.expr(f"percentile(unix_micros(ts), array({qfracs}))").alias("b")
        ).first()[0]
        c = F.lit(1)
        for b in bounds:
            c = c + (F.unix_micros("ts") > F.lit(int(b))).cast("int")
        stage = os.path.join(d, "stage")
        # repartition on __c → each chunk is one task → one file per dir
        static.withColumn("__c", c).repartition(n_chunks, "__c").write.partitionBy(
            "__c"
        ).parquet(stage)
        for ci in range(1, n_chunks + 1):
            chunk_dir = os.path.join(stage, f"__c={ci}")
            if not os.path.isdir(chunk_dir):
                continue  # degenerate tie pile-up emptied this chunk
            part = next(f for f in os.listdir(chunk_dir) if f.endswith(".parquet"))
            dst = os.path.join(d, f"chunk_{ci:02d}.parquet")
            os.rename(os.path.join(chunk_dir, part), dst)
            # ascending mtimes: the file source processes oldest-first
            ts = _time.time() - (n_chunks - ci) * 10
            os.utime(dst, (ts, ts))
        _shutil.rmtree(stage, ignore_errors=True)
        _CHUNKED[key] = d
    d = _CHUNKED[key]
    first = sorted(f for f in os.listdir(d) if f.startswith("chunk_"))[0]
    schema = spark.read.parquet(os.path.join(d, first)).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def run_tws_drain_to_table(
    stream_df: DataFrame,
    output_mode: str = "append",
    state_partitions: int | None = 8,
    poll_s: float = 0.5,
    timeout_s: float = 120.0,
) -> DataFrame:
    """run_tws_to_table for PROCESSING-TIME transformWithState
    pipelines. In timeMode="processingTime" the engine keeps
    scheduling batches after the source is drained (TTL cleanup /
    proc-time timer sweeps), so ``availableNow`` never terminates on
    its own — observed: batch ids climbing past 100 on a drained
    2-file source. Instead: poll ``recentProgress`` until the source
    has reported data at least once and then two consecutive
    zero-input batches (= drained, all files committed), stop the
    query, return the sink table. This is the standard drain pattern
    for proc-time streams; the emitted rows are already final because
    empty batches add nothing in append mode."""
    import time as _time

    spark = stream_df.sparkSession
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="kcore_ckpt_ttl_")
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        deadline = _time.time() + timeout_s
        seen_input = False
        last_batch = -1
        zero_streak = 0
        while _time.time() < deadline and q.isActive:
            _time.sleep(poll_s)
            for p in q.recentProgress:
                bid = p["batchId"]
                if bid <= last_batch:
                    continue
                last_batch = bid
                rows = p.get("numInputRows", 0)
                if rows > 0:
                    seen_input = True
                    zero_streak = 0
                elif seen_input:
                    zero_streak += 1
            if seen_input and zero_streak >= 2:
                break
        q.stop()
        q.awaitTermination()
    finally:
        spark.conf.set(provider_key, prev_provider)
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def run_tws_to_table(
    stream_df: DataFrame,
    output_mode: str = "append",
    state_partitions: int | None = 8,
) -> DataFrame:
    """run_to_table for transformWithState pipelines: scope the
    RocksDB provider (the engine TWS requires) plus changelog
    checkpointing to this one run, restoring the session confs after
    the memory sink is fully materialized. Measured at sf0.1 (warm,
    3-chunk replay): 16 partitions + snapshot checkpointing ~11s;
    8 partitions + changelog ~6s — each trigger opens one RocksDB
    instance per state partition and snapshot-uploads it at commit,
    so at fixture state volume store count and checkpoint mode
    dominate; a 100 TB deployment sizes partitions back up with
    state volume and keeps changelog checkpointing (the provider
    uploads deltas, snapshots in the background)."""
    spark = stream_df.sparkSession
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    changelog_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    # r14: numRowsTotal is telemetry, not results — RocksDB maintains
    # it with an extra get/count on every state put/delete, a pure
    # write-path tax that grows with state volume. Interleaved A/B at
    # sf0.1 (7 reps): q_stream_tws_sessions min 10.9 s tracked vs
    # 5.9 s untracked (wins 5/7 pairs); q_stream_tws_type_counts
    # neutral. Output rows identical (asserted per rep).
    track_key = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
    prev_provider = spark.conf.get(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    prev_changelog = spark.conf.get(changelog_key, "false")
    prev_track = spark.conf.get(track_key, "true")
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(changelog_key, "true")
    spark.conf.set(track_key, "false")
    try:
        return run_to_table(stream_df, output_mode, state_partitions=state_partitions)
    finally:
        spark.conf.set(provider_key, prev_provider)
        spark.conf.set(changelog_key, prev_changelog)
        spark.conf.set(track_key, prev_track)

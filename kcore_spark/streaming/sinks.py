"""Streaming sinks: exactly-once delivery of micro-batches into the
topic log.

Structured Streaming's foreachBatch contract is at-least-once: after a
failure the restarted query MAY re-deliver the last batch (same
batchId). The topic sink turns that into exactly-once by riding the
topic log's own atomic commit point: ``TopicLog.produce(...,
sink_commit=(sink_id, batch_id))`` records the batch id in the SAME
watermark-file ``os.replace`` that makes the batch's offsets visible.
Either both land or neither does, so on re-delivery the sink sees the
committed id and skips — no transactional coordinator needed, which is
exactly how Kafka's own exactly-once foreachBatch patterns work
(idempotent writes keyed by batchId).

Scale: the skip check is one control-file read (driver-side, no Spark
job); the produce is the normal partition-shuffle + window append.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


def topic_sink(
    log,
    topic: str,
    sink_id: str,
    order_by: list[str],
    partition_expr: Column | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
):
    """foreachBatch callable writing each micro-batch into ``topic``
    exactly once.

    ``sink_id`` names this logical sink (one per query/checkpoint —
    two different queries feeding one topic use distinct ids so their
    batch-id sequences don't collide). ``order_by`` fixes intra-batch
    offset order for deterministic replay. ``transform`` optionally
    reshapes the batch into the (key, value[, timestamp, headers])
    record schema before the produce.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= log.sink_committed(topic, sink_id):
            return  # re-delivered batch: already committed atomically
        out = transform(batch_df) if transform is not None else batch_df
        log.produce(
            topic,
            out,
            partition_expr=partition_expr,
            order_by=order_by,
            sink_commit=(sink_id, batch_id),
        )

    return write

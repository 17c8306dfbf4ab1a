"""Training-sequence assembly operators: greedy token packing and
overlapping document chunking.

Provenance: declared surface of OUR engine (training-data pipeline
ops); the reference has no data operators (single-arm dispatch,
`/root/reference/pkg/kafka/kafka_api.go:84-97`).

Why these exist: an LLM pre-training pipeline ends by (a) splitting
long documents into model-window-sized chunks and (b) packing short
documents into fixed-token-budget sequences so no context window is
wasted on padding. Both must be DETERMINISTIC (the same corpus must
produce the same sequences on every run and on any cluster layout) —
chunking is pure column math, and packing fixes a total order within
each group before the sequential fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into ``size``-char chunks whose starts are
    ``size - overlap`` apart (so consecutive chunks share ``overlap``
    chars — the standard RAG/window-split shape).

    Chunk starts (1-based) are 1, 1+stride, 1+2*stride, ...; emission
    stops once a chunk reaches the end of the document (covered-stop:
    no trailing chunk that is wholly contained in its predecessor). A
    document of length L yields 1 + max(ceil((L-size)/stride), 0)
    chunks; an empty document yields none.

    Scale: pure column expressions (sequence + explode + substring) —
    no shuffle, no UDF; rides the scan and multiplies rows map-side,
    so it parallelizes with the input partitioning.
    """
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    stride = size - overlap
    n_chunks = (
        F.greatest(
            F.floor((F.length(text_col) - size + stride - 1) / stride), F.lit(0)
        )
        + 1
    ).cast("int")
    return (
        docs.where(F.length(text_col) > 0)
        .select(
            F.col(id_col),
            F.col(text_col).alias("_text"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.substring(
                F.col("_text"), F.col("chunk_idx") * stride + 1, size
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


def pack_greedy(
    docs: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Greedy sequential packing: within each ``group_col`` partition,
    walk items in ``order_col`` order keeping a running fill; when
    adding the next item would exceed ``budget``, start a new sequence.
    An item heavier than the whole budget occupies its own sequence.

    Returns the input key columns plus (seq_id, seq_fill) where seq_id
    numbers sequences within the group from 0 and seq_fill is the
    running total after placing the item.

    Scale: the fill is inherently sequential PER GROUP, so the
    parallel unit is the group (language, source shard, date bucket —
    pipelines always have one). applyInPandas gives each group to one
    task as an Arrow batch; with thousands of groups the stage
    saturates the cluster, and no state crosses group boundaries. A
    group too large for one task's memory should be pre-split by a
    salt column that the caller folds into ``group_col`` (packing is
    then greedy within each salt shard — same guarantee pipelines
    actually need: bounded sequences, deterministic layout).
    """
    import pandas as pd

    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in docs.select(group_col, order_col, weight_col).schema.fields
        )
        + ", seq_id long, seq_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        seq_ids, fills = [], []
        seq, fill = 0, 0
        for w in pdf[weight_col].astype("int64"):
            if fill > 0 and fill + w > budget:
                seq += 1
                fill = 0
            fill += int(w)
            seq_ids.append(seq)
            fills.append(fill)
        pdf = pdf[[group_col, order_col, weight_col]].copy()
        pdf["seq_id"] = seq_ids
        pdf["seq_fill"] = fills
        return pdf

    return docs.select(group_col, order_col, weight_col).groupBy(group_col).applyInPandas(
        pack, out_schema
    )

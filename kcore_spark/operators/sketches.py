"""Count-min sketch: fixed-size frequency estimation for heavy-hitter
detection over unbounded key domains.

The 100 TB story: a groupBy over a high-cardinality key (URLs, user
ids, shingles) shuffles one row per distinct key; a count-min sketch
shuffles at most d×w counter rows NO MATTER the cardinality — the
sketch is built with one partial-aggregated groupBy over (row, bucket)
and estimates are a broadcast join against the (tiny) sketch table.
Estimates are biased up only (collisions add), never down, with the
classic (ε=e/w, δ=e^-d) guarantee.

Hashing is the md5-prefix construction shared with the MinHash
operator (operators/dedup.py) so a DuckDB oracle can replicate the
sketch bit-for-bit: hash_j(k) = int(md5(j || '|' || k)[:8], 16) % w.

Provenance: declared analytics surface of OUR engine (SURVEY §2.3);
the reference implements no operators (its one dispatch arm is
ApiVersions, `/root/reference/pkg/kafka/kafka_api.go:84-97`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(digest: F.Column, j: int, width: int) -> F.Column:
    """Row j's bucket from ONE shared md5 digest: the 128-bit digest
    yields four independent 32-bit words (hex windows), so the sketch
    costs one hash per input row instead of depth hashes — the
    standard multi-hash-from-one-digest construction."""
    return F.pmod(
        F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long"),
        F.lit(width),
    )


def count_min_sketch(
    df: DataFrame, key: F.Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (row j, bucket, cnt) — at most depth×width
    rows after one partial-aggregated shuffle. `key` must be a string
    column/expression (hashing is over its exact text)."""
    assert depth <= 4, "one md5 digest supplies at most four 32-bit rows"
    # project the key FIRST, then spread: the hash+explode stage is
    # CPU-bound but byte-light, so it inherits the scan's few input
    # splits unless explicitly repartitioned (the same byte-vs-CPU
    # mismatch blocked_fuzzy_pairs documents) — the shuffle moves one
    # narrow column, the win is full-core hashing
    digest = F.md5("__cms_key")
    df = df.select(key.alias("__cms_key")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(digest, j, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: F.Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key in `keys`: min over the depth rows of
    the key's bucket counters. The sketch is depth×width rows — always
    broadcast; the keys side streams, so estimating any number of keys
    is map-side work plus one tiny aggregate."""
    digest = F.md5(key)
    probes = keys.select(
        key.alias("k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(digest, j, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("k", F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("k")
        .agg(F.min("cnt").alias("est"))
    )

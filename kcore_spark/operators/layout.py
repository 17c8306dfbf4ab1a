"""Clustered file layout: range-sorted parquet with a min/max manifest
for file-level data skipping.

Why: at 100 TB, partition pruning handles the coarse dimension (date,
tenant) but point/range predicates on a sort-friendly key (order id,
user id, timestamp) still scan every file unless the layout clusters
by that key. ``cluster_write`` produces non-overlapping sorted runs —
``repartitionByRange`` gives disjoint key ranges per output file,
``sortWithinPartitions`` makes row groups internally ordered so
parquet min/max stats are tight — and records each file's key range in
a manifest. ``pruned_scan`` then plans a range read over only the
files whose range intersects the predicate, the same
footer-stats-driven skipping the topic log's fetch path uses
(sources/topic_log.py) generalized to any table.

The skipped-file decision is driver-side over the manifest —
O(files), no data touched — and the residual predicate still applies
in the scan, so pruning is an optimization, never a semantics change.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_layout_manifest.json"


def cluster_write(
    df: DataFrame, path: str, key: str, num_files: int | None = None
) -> dict:
    """Write ``df`` clustered by ``key``: range-partitioned into
    ``num_files`` non-overlapping sorted runs + a min/max manifest.
    Returns the manifest ({file: {"min": .., "max": ..}}). Numeric
    sort keys only (json-representable footer stats)."""
    import pyarrow.parquet as pq

    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )
    man: dict[str, dict] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ki = cols[key]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ki).statistics
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            man[fname] = {"min": lo, "max": hi}
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({"key": key, "files": man}, f)
    return man


def pruned_scan(spark: SparkSession, path: str, key: str, lo, hi) -> DataFrame:
    """Range scan reading ONLY the files whose [min, max] intersects
    [lo, hi] per the manifest, with the residual predicate applied on
    top. Equivalent to a full scan + filter; touches O(selectivity)
    files instead of all of them."""
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    assert man["key"] == key, f"layout clustered by {man['key']!r}, not {key!r}"
    picked = [
        os.path.join(path, fname)
        for fname, rng in sorted(man["files"].items())
        if not (rng["max"] < lo or rng["min"] > hi)
    ]
    if not picked:
        return spark.read.parquet(path).where(F.lit(False))
    return (
        spark.read.parquet(*picked)
        .where((F.col(key) >= lo) & (F.col(key) <= hi))
    )


def files_for_range(path: str, lo, hi) -> list[str]:
    """The manifest-pruned file list for a range (observability/tests)."""
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    return [
        fname
        for fname, rng in sorted(man["files"].items())
        if not (rng["max"] < lo or rng["min"] > hi)
    ]


# ------------------------------------------------------- Z-order layout


def _interleave_bits(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Morton code: interleave the low `bits` bits of two non-negative
    ints — pure JVM bit arithmetic (shiftleft/shiftright riding
    codegen), no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column `|` is logical OR in PySpark; bit math needs bitwiseOR
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame, path: str, key_a: str, key_b: str, num_files: int | None = None
) -> dict:
    """Two-dimensional clustering (the Delta OPTIMIZE ZORDER analog):
    rank each key into 16-bit buckets (ntile — rank-based so skewed
    value ranges still spread), interleave into a Morton code, and
    range-write sorted by it. Each output file then covers a compact
    REGION of (a, b) space, so min/max footer stats stay tight on BOTH
    columns and a predicate on either (or both) prunes files — the
    property a single-key sort gives only its leading column.

    The per-file manifest records both columns' ranges; ``zorder_scan``
    prunes with a 2-dim rectangle test. The per-key bucket rank is
    computed from APPROX-QUANTILE BOUNDARIES (one distributed
    Greenwald-Khanna pass per key, driver gets ≤4096 boundary floats,
    then a broadcast JVM binary-search Bucketizer assigns buckets
    map-side) — NOT a global-ordering ntile window, so there is no
    single-task sort anywhere: quantile pass, bucket lookup, and the
    final repartitionByRange(__z) are all parallel. Rank-based
    bucketing is preserved (skewed value ranges still spread); minor
    boundary approximation only moves rows between ADJACENT buckets,
    which leaves the clustering property intact."""
    import pyarrow.parquet as pq
    from pyspark.ml.feature import Bucketizer

    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    # Bucket resolution scales with the FILE count, not a fixed 2^12:
    # pruning only ever decides at file granularity, so ~16 bucket
    # boundaries per output file per dimension already gives the
    # manifest tight per-file rectangles. The old constant 4096 forced
    # a 4095-quantile Greenwald-Khanna pass at 1/16384 relative error —
    # the most expensive stage of the write (driver-side summary merge
    # scales with quantile count × 1/error) for resolution the 16-file
    # layout could not use (guide §1.2: don't compute things you throw
    # away).
    n_buckets = max(256, 16 * n)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    work = df.withColumn("__da", F.col(key_a).cast("double")).withColumn(
        "__db", F.col(key_b).cast("double")
    )
    qa, qb = work.stat.approxQuantile(
        ["__da", "__db"], probs, 1.0 / (4 * n_buckets)
    )

    def _splits(bounds: list[float]) -> list[float]:
        out = [float("-inf")]
        for v in bounds:
            if v > out[-1]:
                out.append(v)
        out.append(float("inf"))
        return out

    sa, sb = _splits(qa), _splits(qb)
    bits = max(len(sa), len(sb)).bit_length()
    work = Bucketizer(
        splitsArray=[sa, sb], inputCols=["__da", "__db"], outputCols=["__ba", "__bb"]
    ).transform(work)
    z = work.withColumn(
        "__z",
        _interleave_bits(
            F.col("__ba").cast("long"), F.col("__bb").cast("long"), bits=bits
        ),
    ).drop("__da", "__db", "__ba", "__bb")
    (
        z.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    man: dict[str, dict] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rng: dict[str, float] = {}
        ok = True
        for key, tag in ((key_a, "a"), (key_b, "b")):
            ki = cols[key]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ki).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if not ok or lo is None:
                ok = False
                break
            rng[f"{tag}_min"], rng[f"{tag}_max"] = lo, hi
        if ok:
            man[fname] = rng
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({"zorder": [key_a, key_b], "files": man}, f)
    return man


def zorder_scan(
    spark: SparkSession,
    path: str,
    key_a: str,
    a_lo,
    a_hi,
    key_b: str,
    b_lo,
    b_hi,
) -> DataFrame:
    """Rectangle scan over a Z-ordered layout: read only files whose
    (a, b) bounding box intersects the query rectangle, then apply the
    residual predicate."""
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    assert man.get("zorder") == [key_a, key_b], (
        f"layout z-ordered by {man.get('zorder')}, not [{key_a}, {key_b}]"
    )
    picked = [
        os.path.join(path, fname)
        for fname, r in sorted(man["files"].items())
        if not (
            r["a_max"] < a_lo or r["a_min"] > a_hi
            or r["b_max"] < b_lo or r["b_min"] > b_hi
        )
    ]
    if not picked:
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*picked).where(
        (F.col(key_a) >= a_lo) & (F.col(key_a) <= a_hi)
        & (F.col(key_b) >= b_lo) & (F.col(key_b) <= b_hi)
    )


def zorder_files_for_rect(path: str, a_lo, a_hi, b_lo, b_hi) -> list[str]:
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    return [
        fname
        for fname, r in sorted(man["files"].items())
        if not (
            r["a_max"] < a_lo or r["a_min"] > a_hi
            or r["b_max"] < b_lo or r["b_min"] > b_hi
        )
    ]

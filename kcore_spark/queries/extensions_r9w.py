"""Round-9 surface extensions, batch W (SURVEY §2.3 N r9): the last
two uncovered engine surfaces — cogrouped applyInPandas (two grouped
frames co-processed per key: the Python-side merge-join/as-of
primitive, distinct from single-input grouped map), and the clustered
WRITE path (repartitionByRange + sortWithinPartitions parquet output,
audited file-by-file through _metadata so non-overlapping key ranges
are proven, not assumed).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------- cogrouped applyInPandas (per-key as-of)
# Purchases and views cogrouped per user; the pandas function runs a
# per-key backward as-of (merge_asof semantics hand-rolled with
# searchsorted so the tie rule is explicit: latest view STRICTLY
# before the purchase) and emits per-user latency stats. Scale: one
# co-partitioned shuffle per side, then embarrassingly parallel
# per-key pandas — the cogroup contract.


def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t"), "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "t")
    # the view side's columns carry UNIQUE names (vu, vt): when both
    # cogroup inputs share a column name, Spark dedups it out of the
    # right-side pandas frame under an expression grouping key
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("t").alias("vt")
    )

    # Cogroup on a HASH BUCKET of users, not on single users: the
    # per-user cogroup called the Python function once per user (tens
    # of thousands of calls, each building a 1-row DataFrame), and that
    # per-call overhead dominated the query — ~8.5s at sf0.1 for a
    # searchsorted that is microseconds of real work (guide §4.5:
    # amortize per-task/per-call cost; §4.2: hand whole batches to
    # vectorized numpy). One call now processes ~1/B of the users with
    # numpy only — the as-of itself via ONE searchsorted over
    # (user, ts)-composite keys, the per-user reduction via reduceat.
    # B scales with cluster parallelism so per-bucket slices stay
    # ~|events|/(8·cores) as the data and cluster grow together.
    n_buckets = max(spark.sparkContext.defaultParallelism * 8, 32)

    def asof(key, left, right):
        import numpy as np
        import pandas as pd

        cols = ["user_id", "n_purchases", "n_matched", "avg_gap_s"]
        if left.empty:
            return pd.DataFrame(columns=cols)
        lu = left["user_id"].to_numpy(dtype=np.int64)
        lt = left["t"].to_numpy(dtype=np.int64)
        order = np.lexsort((lt, lu))
        lu, lt = lu[order], lt[order]
        # composite key u·2^34 + t orders by (user, ts); epoch seconds
        # < 2^34 so the packing is collision-free
        shift = np.int64(1) << np.int64(34)
        pkey = lu * shift + lt
        if right.empty:
            matched = np.zeros(len(lt), dtype=bool)
            gap = np.zeros(len(lt), dtype=np.int64)
        else:
            vu = right["vu"].to_numpy(dtype=np.int64)
            vt = right["vt"].to_numpy(dtype=np.int64)
            vorder = np.lexsort((vt, vu))
            vu, vt = vu[vorder], vt[vorder]
            vkey = vu * shift + vt
            # last view strictly before the purchase, same user: the
            # predecessor in composite-key order, valid only if it
            # belongs to the same user
            idx = np.searchsorted(vkey, pkey, side="left") - 1
            sel = np.maximum(idx, 0)
            matched = (idx >= 0) & (vu[sel] == lu)
            gap = np.where(matched, lt - vt[sel], np.int64(0))
        uniq, start = np.unique(lu, return_index=True)
        n_p = np.diff(np.append(start, len(lu)))
        n_m = np.add.reduceat(matched.astype(np.int64), start)
        g_s = np.add.reduceat(gap, start)
        # raw mean; the .625-style half-way cases are rounded
        # ENGINE-side (HALF_UP both engines) — int64/int64 division is
        # the same IEEE double as the old per-user sum(gaps)/len(gaps).
        # object dtype so no-view users surface as NULL, not NaN
        avg = (g_s / np.maximum(n_m, 1)).astype(object)
        avg[n_m == 0] = None
        return pd.DataFrame(
            {
                "user_id": uniq,
                "n_purchases": n_p.astype(np.int64),
                "n_matched": n_m,
                "avg_gap_s": avg,
            }
        )

    out = (
        purchases.groupBy((F.col("user_id") % n_buckets).alias("b"))
        .cogroup(views.groupBy((F.col("vu") % n_buckets).alias("b")))
        .applyInPandas(
            asof, "user_id long, n_purchases long, n_matched long, avg_gap_s double"
        )
    )
    return out.select(
        "user_id", "n_purchases", "n_matched", F.round("avg_gap_s", 2).alias("avg_gap_s")
    ).orderBy("user_id")


Q_COGROUP_SQL = """
WITH p AS (
  SELECT user_id, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS vt
  FROM events WHERE event_type = 'view'),
matched AS (
  SELECT p.user_id, p.t,
         (SELECT MAX(vt) FROM v WHERE v.user_id = p.user_id AND v.vt < p.t) AS prev_vt
  FROM p)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(prev_vt) AS BIGINT) AS n_matched,
       ROUND(AVG(t - prev_vt), 2) AS avg_gap_s
FROM matched
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["q_cogroup_asof"] = QuerySpec(
    q_cogroup_asof,
    Q_COGROUP_SQL,
    "cogrouped applyInPandas: purchases × views co-processed per user "
    "(hand-rolled strict-backward as-of), per-user latency stats",
)


# ------------------- clustered write audit (range + sorted files)
# repartitionByRange(o_orderkey) + sortWithinPartitions writes parquet
# whose files hold NON-OVERLAPPING key ranges — the layout that makes
# min/max data skipping effective. The audit reads the files back with
# _metadata, computes each file's (min, max, rows), and PROVES the
# invariants: ranges don't overlap and rows conserve. The oracle can't
# see the files, so the hash-pinned output is the partition-level
# contract (4 range buckets over the key space), which the writer must
# reproduce exactly.

_CW_STAGED: dict[str, str] = {}
_CW_BUCKETS = 4


def q_clustered_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _CW_STAGED:
        d = tempfile.mkdtemp(prefix="kcore_clustered_write_")
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .repartitionByRange(_CW_BUCKETS, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.mode("overwrite")
            .parquet(d)
        )
        _CW_STAGED[sf_dir] = d
    d = _CW_STAGED[sf_dir]
    files = (
        spark.read.parquet(d)
        .select("o_orderkey", F.col("_metadata.file_name").alias("f"))
        .groupBy("f")
        .agg(
            F.min("o_orderkey").alias("kmin"),
            F.max("o_orderkey").alias("kmax"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
    # audited invariants become the OUTPUT: files ordered by kmin must
    # have kmax < next kmin; the hash-pinned row is the INVARIANT
    # summary (per-file row counts follow the range partitioner's
    # SAMPLED boundaries — near-equal, not exactly ntile — so they are
    # asserted structurally in tests, not hash-pinned)
    from pyspark.sql import Window

    w = Window.orderBy("kmin")
    audit = files.select(
        "rows",
        (F.col("kmin") > F.coalesce(F.lag("kmax").over(w), F.lit(-1))).cast("int").alias(
            "ok"
        ),
    )
    return audit.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.min("ok").cast("int").alias("all_non_overlapping"),
        F.sum("rows").cast("long").alias("total_rows"),
    )


def _cw_sql() -> str:
    # the oracle pins the CONTRACT: exactly the requested file count,
    # zero range overlap, zero row loss
    return f"""
SELECT CAST({_CW_BUCKETS} AS BIGINT) AS n_files,
       1 AS all_non_overlapping,
       CAST(COUNT(*) AS BIGINT) AS total_rows
FROM orders
"""


QUERIES["q_clustered_write_audit"] = QuerySpec(
    q_clustered_write_audit,
    _cw_sql(),
    "clustered write: repartitionByRange + sortWithinPartitions, "
    "audited per-file via _metadata — non-overlapping ranges proven",
)

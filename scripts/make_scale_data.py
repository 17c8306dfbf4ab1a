#!/usr/bin/env python3
"""Derive a K×-scaled copy of the sf0.1 fixtures for SCALING BENCHMARKS.

PERF-ONLY DATA: correctness is always checked against the driver's
own fixtures; this derived set exists solely to measure how query
runtimes scale (VERDICT r2 #4 — "the scaling curve is the evidence
that plans hold"). Written to /tmp (not the repo): deterministic, so
regenerating yields identical bytes-for-bytes inputs.

Derivation (copy i of K, i = 0..K-1):
- region/nation: dimensions don't scale (TPC-H's own rule) — verbatim.
- customer/supplier/part/orders/lineitem: every key column shifted by
  i × (max_base_key + 1) so foreign-key relationships hold WITHIN a
  copy and never collide across copies — join fan-outs per key are
  exactly the base dataset's, row counts are K×.
- events: event_id/user_id shifted the same way (user_id aligns with
  c_custkey for the as-of join).
- documents: doc_id shifted; every word in `text` is suffixed with the
  copy number, so vocabularies of different copies are DISJOINT —
  shingle/minhash/simhash statistics per copy match the base corpus
  exactly, and no artificial cross-copy near-duplicates appear (10
  identical copies of each text would otherwise manufacture quadratic
  duplicate cliques the base corpus doesn't have).
- embeddings: vec_id shifted; copy 0 keeps vectors verbatim, copies
  i > 0 get a DETERMINISTIC per-element perturbation — each element is
  blended 50/50 with a hash-derived pseudo-random value seeded by
  (vec_id, copy, element index) — so cross-copy twins sit far below
  any near-dup threshold (measured cross-copy cosine ~0.6-0.8, not
  1.0). This keeps embedding-family TRUTH linear in corpus size (the
  r9 verdict's fixture blind spot: verbatim copies made
  q_neardup_threshold_sweep's truth quadratic, reading as a phantom
  31.8x), so near-dup/semantic-cluster queries can join the scaling
  sweep instead of being skipped.
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/kcore_benchdata"

# key column → offset unit is max(base)+1, precomputed per run
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key family → which base table/column defines its offset unit
FAMILY = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "user_id": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def build(k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    units = {}
    for col, (tbl, base_col) in FAMILY.items():
        units[col] = (
            con.sql(f"SELECT MAX({base_col}) + 1 FROM '{BASE}/{tbl}.parquet'").fetchone()[0]
        )
    for tbl in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{BASE}/{tbl}.parquet') TO "
            f"'{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    for tbl, keys in KEYED.items():
        cols = con.sql(f"SELECT * FROM '{BASE}/{tbl}.parquet' LIMIT 0").columns
        select_parts = []
        for c in cols:
            if c in keys:
                select_parts.append(f"{c} + i * {units[c]} AS {c}")
            elif tbl == "events" and c == "ts":
                # materialize epoch-ns BIGINT regardless of the base
                # encoding (fixtures have shipped both TIMESTAMP(NANOS)
                # and timestamp[us]) — the engine's normalize_event_ts
                # accepts the long form, and keeping the derived set on
                # the LEGACY encoding doubles as a standing exercise of
                # that branch at scale (see tests/test_schema_drift.py)
                select_parts.append("epoch_ns(ts) AS ts")
            elif tbl == "embeddings" and c == "embedding":
                # deterministic per-element jitter for copies i > 0:
                # blend each element 50/50 with a hash-seeded value in
                # [-0.25, 0.25] so cross-copy pairs are NOT cosine-1.0
                # twins and near-dup truth stays linear in corpus size
                select_parts.append(
                    "CASE WHEN i = 0 THEN embedding ELSE "
                    "list_transform(generate_series(1, len(embedding)), j -> "
                    "CAST(0.5 * embedding[j] + "
                    "((hash(vec_id * 131071 + i * 8191 + j) % 1000) / 2000.0 "
                    "- 0.25) AS FLOAT)) END AS embedding"
                )
            elif tbl == "documents" and c == "text":
                # disjoint vocabulary per copy: suffix every word
                select_parts.append(
                    "CASE WHEN i = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', '\\1_' || i, 'g') END AS text"
                )
            else:
                select_parts.append(c)
        sel = ", ".join(select_parts)
        con.sql(
            f"COPY (SELECT {sel} FROM '{BASE}/{tbl}.parquet', "
            f"(SELECT UNNEST(generate_series(0, {k - 1})) AS i) "
            f"ORDER BY i) TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    con.close()


def ensure(k: int = 10) -> str:
    """Build (once) and return the derived dir for K copies of sf0.1.

    Rebuilds when any base fixture is newer than the marker — the
    driver regenerates fixtures between rounds, and a cached
    derivation of the OLD base would silently measure stale data."""
    out_dir = os.path.join(OUT_ROOT, f"sf{k / 10:g}")
    marker = os.path.join(out_dir, "_COMPLETE")
    # version stamp: bump when the derivation RULES change so a cached
    # build of the old rules is invalidated (r10: perturbed embeddings)
    stamp = f"derived from {BASE} x{k} v2-perturbed-embeddings\n"
    base_mtime = max(
        os.path.getmtime(os.path.join(BASE, f)) for f in os.listdir(BASE)
    )
    stale = (
        not os.path.exists(marker)
        or os.path.getmtime(marker) < base_mtime
        or open(marker).read() != stamp
    )
    if stale:
        build(k, out_dir)
        with open(marker, "w") as f:
            f.write(stamp)
    return out_dir


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(ensure(k))

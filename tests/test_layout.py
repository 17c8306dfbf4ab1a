"""Clustered layout + manifest-pruned range scans: results identical to
a full-scan filter, while touching only the intersecting files."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kcore_spark.operators.layout import cluster_write, files_for_range, pruned_scan


def _write(spark, n=10_000, files=8):
    path = tempfile.mkdtemp(prefix="kcore_layout_")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    man = cluster_write(df, path, "k", num_files=files)
    return path, man


def test_cluster_write_produces_disjoint_sorted_runs(spark):
    path, man = _write(spark)
    ranges = sorted((r["min"], r["max"]) for r in man.values())
    assert len(ranges) >= 2
    for (al, ah), (bl, bh) in zip(ranges, ranges[1:]):
        assert ah < bl, f"overlapping runs: ({al},{ah}) vs ({bl},{bh})"


def test_pruned_scan_matches_full_filter_and_skips_files(spark):
    path, man = _write(spark)
    got = sorted(
        r.k for r in pruned_scan(spark, path, "k", 2500, 3500).collect()
    )
    assert got == list(range(2500, 3501))
    touched = files_for_range(path, 2500, 3500)
    assert 0 < len(touched) < len(man), (
        f"no skipping: {len(touched)}/{len(man)} files touched"
    )


def test_pruned_scan_empty_range(spark):
    path, _ = _write(spark, n=1000)
    assert pruned_scan(spark, path, "k", 10_000, 20_000).count() == 0
    assert files_for_range(path, 10_000, 20_000) == []


def test_pruned_scan_boundary_inclusive(spark):
    path, man = _write(spark, n=1000, files=4)
    # pick an exact file boundary: max of the first run
    first_hi = sorted(r["max"] for r in man.values())[0]
    got = sorted(r.k for r in pruned_scan(spark, path, "k", first_hi, first_hi + 1).collect())
    assert got == [first_hi, first_hi + 1]


# ------------------------------------------------------- Z-order layout


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    from kcore_spark.operators.layout import (
        zorder_files_for_rect,
        zorder_scan,
        zorder_write,
    )

    df = spark.range(40_000).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 7919, F.lit(40_000)).alias("b"),  # decorrelated dim
        (F.col("id") % 97).alias("v"),
    )
    path = str(tmp_path / "z")
    man = zorder_write(df, path, "a", "b", num_files=16)
    assert len(man) == 16
    n_all = len(man)
    # a narrow rectangle in BOTH dims prunes most files
    picked = zorder_files_for_rect(path, 0, 2500, 0, 2500)
    assert 0 < len(picked) < n_all / 2
    # a slice constrained ONLY on b (the non-leading dim of a plain
    # sort) still prunes — the property z-ordering buys
    picked_b = zorder_files_for_rect(path, 0, 40_000, 0, 2500)
    assert len(picked_b) < n_all
    # correctness: pruned rectangle scan == full filter
    got = zorder_scan(spark, path, "a", 0, 2500, "b", 0, 2500)
    want = df.where((F.col("a") <= 2500) & (F.col("b") <= 2500))
    assert sorted(r["a"] for r in got.collect()) == sorted(
        r["a"] for r in want.collect()
    )


def test_zorder_empty_rectangle(spark, tmp_path):
    from kcore_spark.operators.layout import zorder_scan, zorder_write

    df = spark.range(100).select(F.col("id").alias("a"), F.col("id").alias("b"))
    path = str(tmp_path / "z2")
    zorder_write(df, path, "a", "b", num_files=4)
    assert zorder_scan(spark, path, "a", 1000, 2000, "b", 0, 10).count() == 0

"""Round-8b extension operators: invariants the sf0.01 oracle parity
can't see — k-means separates an obviously-separable corpus and its
inertia is monotone under Lloyd updates, min-label propagation equals
connected components within the hop radius, Gini's uniform/degenerate
boundaries, and chi-squared's independence zero."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR
from kcore_spark.operators.similarity import as_double
from kcore_spark.queries.extensions_r8b import (
    KMEANS_K,
    LP_ITERS,
    _assign,
    _sq_dist,
)


# --------------------------------------------------------- k-means


def _two_blob_points(spark, n=60):
    """Two far-apart axis blobs in 4-d: ids 0..n-1 near the origin,
    ids n..2n-1 near (100,100,100,100), with small deterministic
    jitter so points are distinct."""
    rows = []
    for i in range(n):
        j = (i % 7) * 0.1
        rows.append((i, [0.0 + j, 1.0 - j, j, 0.5]))
        rows.append((n + i, [100.0 + j, 101.0 - j, 100.0 + j, 100.5]))
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def test_assign_puts_blobs_with_their_own_seed(spark):
    pts = _two_blob_points(spark)
    cent = pts.where(F.col("vec_id").isin(0, 60)).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    got = _assign(pts, cent).select("vec_id", "cid").collect()
    for r in got:
        want = 0 if r["vec_id"] < 60 else 60
        assert r["cid"] == want, (r["vec_id"], r["cid"])


def test_lloyd_update_never_increases_inertia(spark):
    """One Lloyd round: inertia with mean-updated centroids must be
    <= the seed-centroid inertia (the textbook monotonicity)."""
    pts = _two_blob_points(spark)
    cent = pts.where(F.col("vec_id").isin(0, 60)).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    a0 = _assign(pts, cent)
    i0 = a0.agg(F.sum("dist")).first()[0]
    cent1 = (
        a0.select("cid", F.posexplode("e").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg((F.sum("x") / F.count(F.lit(1))).alias("m"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("ce")
        )
    )
    i1 = _assign(pts, cent1).agg(F.sum("dist")).first()[0]
    assert i1 <= i0 + 1e-9


def test_sq_dist_is_sequential_fold(spark):
    got = (
        spark.createDataFrame([([1.0, 2.0, 3.0], [0.0, 0.0, 0.0])], "a array<double>, b array<double>")
        .select(_sq_dist(F.col("a"), F.col("b")).alias("d"))
        .first()["d"]
    )
    assert got == 14.0


def test_registered_kmeans_covers_all_points(spark):
    from kcore_spark.queries.extensions_r8b import q_kmeans_lloyd

    out = q_kmeans_lloyd(spark, SF_DIR).collect()
    assert sum(r["n_points"] for r in out) == 500
    assert all(0 <= r["cid"] < KMEANS_K for r in out)
    assert all(r["inertia"] >= 0 for r in out)


# ------------------------------------------- min-label propagation


def test_label_propagation_equals_components_within_radius(spark):
    """On a graph whose components have diameter <= LP_ITERS, the
    min-label fixpoint IS connected components: chain 1-2-3, triangle
    10-11-12, isolated edge 20-21."""
    from kcore_spark.queries.extensions_r8b import LP_ITERS

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)], "p1 long, p2 long"
    )
    und = edges.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionByName(
        edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    labels = und.select(F.col("src").alias("n")).distinct().withColumn("lbl", F.col("n"))
    for _ in range(LP_ITERS):
        nb = (
            und.join(labels.select(F.col("n").alias("dn"), "lbl"), und.dst == F.col("dn"))
            .groupBy("src")
            .agg(F.min("lbl").alias("nl"))
        )
        labels = labels.join(nb, labels.n == nb.src, "left").select(
            F.col("n"),
            F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias("lbl"),
        )
    got = {r["n"]: r["lbl"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


# ------------------------------------------------------------ Gini


def _gini(counts):
    """Reference Gini from a plain python list of per-key counts."""
    cs = sorted(counts)
    n, tot = len(cs), sum(cs)
    rw = sum((i + 1) * c for i, c in enumerate(cs))
    return (2 * rw - (n + 1) * tot) / (n * tot)


def test_gini_uniform_is_zero_and_degenerate_is_max():
    assert _gini([5, 5, 5, 5]) == 0.0
    # one key owns everything: Gini -> (n-1)/n
    assert abs(_gini([0 + 1, 1, 1, 997]) - _gini([1, 1, 1, 997])) == 0.0
    assert _gini([1, 1, 1, 997]) == pytest.approx(0.747, abs=1e-9)


def test_registered_gini_matches_reference(spark):
    from kcore_spark.queries.extensions_r8b import q_key_skew_gini
    from kcore_spark.catalog import load_table

    row = q_key_skew_gini(spark, SF_DIR).first()
    counts = [
        r["c"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert row["gini"] == pytest.approx(_gini(counts), abs=1e-9)
    assert 0.0 <= row["top10_share"] <= 1.0


# ------------------------------------------------------------ chi2


def test_chi2_zero_under_exact_independence(spark, monkeypatch, tmp_path):
    """A type whose positive rate equals the global rate contributes
    chi2 == 0 exactly (ad == bc in integers)."""
    import kcore_spark.queries.extensions_r8b as mod

    import datetime

    rows = []
    eid = 0
    t0 = datetime.datetime(2024, 1, 1)
    # both types: 1 positive per 3 negatives — identical rates
    for t in ("a", "b"):
        for k in range(40):
            rows.append((eid, t0, eid % 5, t, 100.0 if k % 4 == 0 else 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = mod.q_chi2_feature_select(spark, str(tmp_path)).collect()
    assert [r["chi2"] for r in out] == [0.0, 0.0]
    assert [(r["a"], r["b"]) for r in out] == [(10, 30), (10, 30)]


# ----------------------------------------------------- JS divergence


def test_js_zero_for_identical_populations(spark, tmp_path):
    """If even and odd users emit identical type distributions, every
    per-type JS contribution is exactly zero (p == q == m)."""
    import datetime

    from kcore_spark.queries.extensions_r8b import q_js_divergence

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(10):  # 5 even, 5 odd
        for t in ("x", "y", "y"):
            rows.append((eid, t0, uid, t, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q_js_divergence(spark, str(tmp_path)).collect()
    assert [r["js_contrib"] for r in out] == [0.0, 0.0]


# ---------------------------------------------------- n-gram novelty


def test_novelty_duplicate_doc_scores_zero(spark, tmp_path):
    """doc 1 is original (novelty 1.0); doc 2 is a verbatim copy of
    doc 1 (novelty 0.0 — every trigram first appeared in doc 1)."""
    from kcore_spark.queries.extensions_r8b import q_ngram_novelty

    text = "alpha beta gamma delta epsilon zeta"
    rows = [(1, text, "en", "s", len(text)), (2, text, "en", "s", len(text))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in q_ngram_novelty(spark, str(tmp_path)).collect()}
    assert out[1]["n_grams"] == 4 and out[1]["novelty"] == 1.0
    assert out[2]["n_grams"] == 4 and out[2]["novelty"] == 0.0


# ------------------------------------------------------ RFM segments


def test_rfm_segments_partition_customers_and_code_range(spark):
    from kcore_spark.catalog import load_table
    from kcore_spark.queries.extensions_r8b import q_rfm_segments

    out = q_rfm_segments(spark, SF_DIR).collect()
    n_cust = (
        load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in out) == n_cust
    for r in out:
        seg = r["segment"]
        assert 1 <= seg // 100 <= 4 and 1 <= seg // 10 % 10 <= 4 and 1 <= seg % 10 <= 4


# -------------------------------------------------------- Zipf fit


def test_zipf_slope_minus_one_on_exact_zipf_corpus(spark, tmp_path):
    """A corpus whose word frequencies are exactly c_r = 720/r for
    ranks 1..6 must fit slope -1 (log-log is exactly linear)."""
    from kcore_spark.queries.extensions_r8b import q_zipf_fit

    words = []
    for r, w in enumerate(["a", "b", "c", "d", "e", "f"], start=1):
        words.extend([w] * (720 // r))
    text = " ".join(words)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = q_zipf_fit(spark, str(tmp_path)).first()
    assert row["n_words"] == 6
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=1e-6)


# ------------------------------------------------- PCA power iteration


def test_pca_loading_is_unit_norm_and_finds_dominant_axis(spark, tmp_path):
    """Vectors spread along axis 5 with small noise elsewhere: the
    dominant loading must be axis 5 and the vector unit-norm."""
    from kcore_spark.queries.extensions_r8b import PCA_DIM, q_pca_power_iteration

    rows = []
    for i in range(50):
        v = [0.01 * ((i + d) % 3) for d in range(PCA_DIM)]
        v[5] = 10.0 + (i % 7)  # dominant variance on axis 5
        rows.append((i, v, 0))
    spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = q_pca_power_iteration(spark, str(tmp_path)).collect()
    assert len(out) == PCA_DIM
    norm = sum(r["loading"] ** 2 for r in out) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-6)
    top = max(out, key=lambda r: abs(r["loading"]))
    assert top["pos"] == 5 and abs(top["loading"]) > 0.99


# ----------------------------------------- driver-window auto-rotation


def test_driver_signed_set_derives_from_disk():
    """The signed set must include every green name from the driver's
    own CORRECTNESS files, so the 50-query window rotates with no
    hand-maintained edit (the r6/r7 repeated process miss)."""
    import json
    import pathlib

    from kcore_spark.queries import _driver_signed_from_disk, all_queries

    disk = _driver_signed_from_disk()
    root = pathlib.Path(__file__).resolve().parents[1]
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    assert files, "driver correctness files expected at repo root"
    latest = json.loads(files[-1].read_text())
    for name, row in latest.items():
        if row.get("err") is None and (row.get("hash_match") or row.get("rows_match")):
            assert name in disk
    # and the window orders unsigned-first
    window = list(all_queries())[:50]
    assert all(n not in disk for n in window) or len(disk) >= len(all_queries())

"""Dedup operator properties: s-curve LSH parameterization and the
pair-restricted Jaccard verifier (VERDICT r1 items #2 and #9)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kcore_spark.operators.dedup import (
    jaccard_for_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    lsh_params,
    minhash_signatures,
    word_shingles,
)

SF_DIR = "/root/testdata/sf0.001"


def _detection(tau: float, bands: int, rows: int) -> float:
    return 1.0 - (1.0 - tau**rows) ** bands


@given(
    tau=st.floats(min_value=0.5, max_value=0.95),
    p_target=st.floats(min_value=0.8, max_value=0.99),
)
@settings(max_examples=200, deadline=None)
def test_lsh_params_meets_target(tau: float, p_target: float):
    bands, rows = lsh_params(tau, p_target, num_hashes=64)
    assert bands * rows <= 64
    assert _detection(tau, bands, rows) >= p_target


def test_lsh_params_tau08_default():
    # The pinned production setting: τ=0.8 → 3 bands × 2 rows, p≈0.953.
    bands, rows = lsh_params(0.8)
    assert (bands, rows) == (3, 2)
    assert _detection(0.8, bands, rows) > 0.95


def test_lsh_params_min_false_positives():
    # Among all feasible bandings within the budget, the chosen one has
    # the lowest false-positive rate at background similarity tau/2.
    tau, p_target, budget = 0.8, 0.95, 6
    bands, rows = lsh_params(tau, p_target, num_hashes=budget)
    chosen_fp = _detection(tau / 2, bands, rows)
    for r in range(1, budget + 1):
        for b in range(1, budget // r + 1):
            if _detection(tau, b, r) >= p_target:
                assert _detection(tau / 2, b, r) >= chosen_fp - 1e-12


def test_lsh_recall_on_planted_near_dups(spark):
    """Planted near-dups (J≈0.99) must be detected: at τ=0.8 the
    s-curve gives p≈0.95 per pair at exactly 0.8 and ≈1.0 at 0.99, so
    LSH candidates should cover every true pair in the fixture."""
    from kcore_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3).persist()
    truth = {
        (r.id1, r.id2) for r in jaccard_pairs(sh, min_jaccard=0.8).collect()
    }
    assert truth, "fixture should contain planted near-dup pairs"
    bands, rows = lsh_params(0.8)
    sigs = minhash_signatures(sh, num_hashes=bands * rows)
    cands = {
        (r.id1, r.id2)
        for r in lsh_candidate_pairs(sigs, bands=bands, rows=rows).collect()
    }
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.95
    sh.unpersist()


def test_jaccard_for_pairs_matches_full_join(spark):
    """The pair-restricted verifier must agree exactly with
    (full jaccard_pairs ⋈ candidates) — same pairs, same values."""
    from kcore_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3).persist()
    sigs = minhash_signatures(sh, num_hashes=6)
    cands = lsh_candidate_pairs(sigs, bands=3, rows=2).persist()

    fast = {
        (r.id1, r.id2): r.jaccard
        for r in jaccard_for_pairs(cands, sh, min_jaccard=0.8).collect()
    }
    slow = {
        (r.id1, r.id2): r.jaccard
        for r in cands.join(jaccard_pairs(sh, min_jaccard=0.8), ["id1", "id2"]).collect()
    }
    assert fast == slow
    sh.unpersist()
    cands.unpersist()


def test_trained_centroids_shape_and_recall(spark):
    """k-means|| centroids drop into ivf_topk and must not regress
    recall vs the seeded first-K variant at the same nprobe."""
    from pyspark.sql import functions as F

    from kcore_spark.operators.similarity import cosine_topk, ivf_topk, train_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 28))
    corpus = emb.where(F.col("vec_id") >= 28)
    seeded = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding")
    trained = train_centroids(corpus, "embedding", "vec_id", k=8, seed=7)
    assert trained.columns == ["vec_id", "embedding"]
    assert trained.count() == 8

    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(corpus, queries, "embedding", "vec_id", 5).collect()
    }
    def recall(cents):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(corpus, queries, cents, "embedding", "vec_id", 5, nprobe=2).collect()
        }
        return len(truth & got) / len(truth)

    assert recall(trained) >= recall(seeded) - 1e-9


def test_simhash_near_dup_banding_is_exact(spark):
    from kcore_spark.operators.dedup import simhash_near_dup

    # pairs at hamming 0-3 must ALL be found (pigeonhole: 4 bands > 3
    # flipped bits); a hamming-4 pair crafted to differ in every byte
    # must be excluded by candidate generation itself
    base = 0b01010101_00110011_00001111_11110000
    fps = [
        (1, base),
        (2, base ^ 0b1),                     # hamming 1, same 3 high bytes
        (3, base ^ 0b11 << 8),               # hamming 2
        (4, base ^ (1 | 1 << 30)),           # hamming 2, split bytes
        (5, base ^ (1 | 1 << 8 | 1 << 16 | 1 << 24)),  # hamming 4, all bytes differ
    ]
    df = spark.createDataFrame(fps, "id long, simhash long")
    got = {(r.id1, r.id2): r.hamming for r in simhash_near_dup(df, max_hamming=3).collect()}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert got[(1, 4)] == 2
    assert (1, 5) not in got  # every byte differs: never a candidate
    assert (2, 3) in got  # hamming(2,3) = 3, shares untouched bytes


def test_simhash64_fingerprint_matches_reference_arithmetic(spark):
    """bits=64 must reproduce the portable md5 arithmetic bit-for-bit:
    hi/lo hex-prefix halves recombined, votes per bit, sign fold —
    checked against a pure-Python reimplementation on a tiny corpus."""
    import hashlib
    import re

    from kcore_spark.operators.dedup import simhash

    rows = [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta iota")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.simhash for r in simhash(df, "doc_id", "text", bits=64).collect()}

    def py_simhash64(text: str) -> int:
        votes = [0] * 64
        for w in set(re.split(r"\s+", text)) - {""}:
            d = hashlib.md5(w.encode()).hexdigest()
            h = (int(d[:8], 16) << 32) | int(d[8:16], 16)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        fp = sum(1 << b for b in range(64) if votes[b] > 0)
        return fp - (1 << 64) if fp >= 1 << 63 else fp  # as signed long

    for doc_id, text in rows:
        assert got[doc_id] == py_simhash64(text), doc_id


def test_simhash64_neardup_recall_on_seeded_corpus(spark):
    """64-bit fingerprints + 16-bit banding: near-dup pairs found by
    the banded join must EQUAL the brute-force hamming<=3 pairs over
    the same fingerprints (pigeonhole exactness at the production
    width), and seeded 1-word perturbations must actually land within
    the radius while unrelated docs stay outside it."""
    from pyspark.sql import functions as F

    from kcore_spark.operators.dedup import simhash, simhash_near_dup

    words = [f"w{i}" for i in range(40)]
    base = " ".join(words)
    rows = [(0, base)]
    # 5 near-dups: replace one word each (tiny vote perturbation)
    for k in range(1, 6):
        toks = list(words)
        toks[k] = f"sub{k}"
        rows.append((k, " ".join(toks)))
    # 5 unrelated docs
    for k in range(6, 11):
        rows.append((k, " ".join(f"z{k}_{i}" for i in range(40))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = simhash(df, "doc_id", "text", bits=64).persist()

    got = {
        (r.id1, r.id2)
        for r in simhash_near_dup(fp, max_hamming=3, bits=64).collect()
    }
    a = fp.select(F.col("id").alias("id1"), F.col("simhash").alias("h1"))
    b = fp.select(F.col("id").alias("id2"), F.col("simhash").alias("h2"))
    brute = {
        (r.id1, r.id2)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .where(F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))) <= 3)
        .collect()
    }
    assert got == brute  # banding is exact at the 64-bit width
    # seeded perturbations must be recalled; unrelated docs must not pair
    assert any(p[0] == 0 or p[1] == 0 for p in got)
    assert all(p[0] <= 5 and p[1] <= 5 for p in got)

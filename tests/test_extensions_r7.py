"""Round-7 extension operators: properties the sf0.01 oracle can't
see — plan-level pruning, filter completeness, determinism, and
peeling invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR as SF_DIR_SMALL

from kcore_spark.catalog import load_table
from kcore_spark.queries.extensions_r7 import (
    BLOOM_HASHES,
    KCORE_K,
    SETSIM_T,
    QUERIES,
    _bloom_hash,
)


def test_bloom_prefilter_actually_prunes(spark):
    """The bloom candidate set must be a strict subset of orders and a
    superset of the true matches — pruning without false negatives
    (the whole point of the runtime-filter pattern)."""
    sf = SF_DIR_SMALL
    cust = (
        load_table(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    n_orders = orders.count()
    true_matches = orders.join(cust, orders.o_custkey == cust.c_custkey).count()

    # rebuild the candidate set exactly as the query does
    words = (
        cust.select(
            F.explode(
                F.array(*[_bloom_hash(F.col("c_custkey"), i) for i in range(BLOOM_HASHES)])
            ).alias("h")
        )
        .select(
            (F.col("h") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(h % 64 AS int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    probes = orders.select(
        "o_orderkey",
        F.explode(
            F.array(*[_bloom_hash(F.col("o_custkey"), i) for i in range(BLOOM_HASHES)])
        ).alias("h"),
    ).select(
        "o_orderkey",
        (F.col("h") / 64).cast("long").alias("word_idx"),
        (F.col("h") % 64).cast("int").alias("pos"),
    )
    cand = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.expr("shiftleft(1L, pos)")) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("hit").alias("n_hits"))
        .where(F.col("n_hits") == BLOOM_HASHES)
        .count()
    )
    assert true_matches <= cand < n_orders, (n_orders, cand, true_matches)


def test_kcore_every_member_has_core_degree_at_least_k(spark):
    rows = QUERIES["q_kcore_subgraph"].spark(spark, SF_DIR_SMALL).collect()
    assert rows, "core empty at sf0.001"
    assert all(r.core_degree >= KCORE_K for r in rows)


def test_setsim_prefix_filter_is_complete(spark):
    """PPJoin must find EXACTLY the brute-force Jaccard pairs — the
    prefix filter prunes candidates, never results."""
    out = {
        (r.id1, r.id2): r.jaccard
        for r in QUERIES["q_setsim_ppjoin"].spark(spark, SF_DIR_SMALL).collect()
    }
    docs = load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")
    toks = {
        r.doc_id: set(
            " ".join(ws[i : i + 3])
            for ws in [r.text.lower().split(" ")]
            for i in range(len(ws) - 2)
        )
        for r in docs.collect()
    }
    brute = {}
    ids = sorted(toks)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i1, i2 = ids[a], ids[b]
            inter = len(toks[i1] & toks[i2])
            union = len(toks[i1] | toks[i2])
            if union and inter / union >= SETSIM_T:
                brute[(i1, i2)] = round(inter / union, 6)
    assert out == brute


def test_dp_noise_is_deterministic_and_bounded(spark):
    a = QUERIES["q_dp_noisy_counts"].spark(spark, SF_DIR_SMALL).collect()
    b = QUERIES["q_dp_noisy_counts"].spark(spark, SF_DIR_SMALL).collect()
    assert a == b  # inverse-CDF over md5-uniform: no RNG anywhere
    ev = load_table(spark, SF_DIR_SMALL, "events")
    true_counts = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in a:
        # Laplace(b=2) noise beyond 30 is astronomically unlikely under
        # the uniform grid; mostly this pins the transform's sanity
        assert abs(r.noisy_n - true_counts[r.event_type]) < 30.0


def test_incremental_maintenance_matches_full_recompute(spark):
    sf = SF_DIR_SMALL
    maintained = QUERIES["q_incremental_agg_maintenance"].spark(spark, sf)
    orders = load_table(spark, sf, "orders")
    final_state = orders.where(
        (F.col("o_orderkey") % 10 == 0)
        | ((F.col("o_orderkey") % 10 != 0) & (F.col("o_orderkey") % 13 != 0))
    )
    recomputed = (
        final_state.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_custkey")
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_bpe_top_pair_is_a_real_character_pair(spark):
    rows = QUERIES["q_bpe_pair_stats"].spark(spark, SF_DIR_SMALL).collect()
    assert rows and all(len(r.pair) == 2 for r in rows)
    # descending counts, fully tie-broken
    ns = [(r.n, r.pair) for r in rows]
    assert ns == sorted(ns, key=lambda t: (-t[0], t[1]))


def test_bigram_lm_scores_are_negative_log_probs(spark):
    rows = QUERIES["q_bigram_lm_score"].spark(spark, SF_DIR_SMALL).collect()
    assert rows and all(r.avg_bigram_logprob < 0 for r in rows)


def test_k_anonymity_flags_only_small_groups(spark):
    from kcore_spark.queries.extensions_r7 import KANON_K

    rows = QUERIES["q_k_anonymity"].spark(spark, SF_DIR_SMALL).collect()
    assert all(r.n < KANON_K for r in rows)

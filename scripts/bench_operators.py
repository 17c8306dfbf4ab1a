#!/usr/bin/env python3
"""Operator strategy micro-benchmarks at sf0.1: measures the scale-path
variant against the naive formulation of the same semantics.

Prints a markdown table (consumed by SCALE.md). Each pair is checked
for result equivalence before timing is reported.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from kcore_spark.operators.dedup import (
    jaccard_for_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from kcore_spark.operators.relational import asof_join
from kcore_spark.operators.scale import bucketed_join, salted_join, write_bucketed
from kcore_spark.operators.similarity import cosine_topk, ivf_topk, train_centroids
from kcore_spark.testing import shared_spark

SF = "/root/testdata/sf0.1"


def t(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> None:
    spark = shared_spark()
    rows = []

    # ---------------- as-of join: union-window vs join+argmax
    from kcore_spark.catalog import normalize_event_ts

    ev = (
        normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    good, t_good = t(
        lambda: asof_join(
            ev, orders, "user_id", "o_custkey", "ts", "o_orderdate", ["o_orderkey"], "o_orderkey"
        ).count()
    )
    w = Window.partitionBy("event_id").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    naive, t_naive = t(
        lambda: ev.join(orders, (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .count()
    )
    assert good == naive, (good, naive)
    rows.append(("as-of join", "union+window (1 shuffle)", t_good, "range join + argmax", t_naive))

    # ---------------- near-dup: LSH+verify vs exact all-pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = word_shingles(docs, "doc_id", "text", 3).persist()
    sh.count()
    exact, t_exact = t(lambda: jaccard_pairs(sh, 0.8).count())
    def lsh():
        sigs = minhash_signatures(sh, 6)
        cands = lsh_candidate_pairs(sigs, 3, 2).persist()
        return jaccard_for_pairs(cands, sh, 0.8).count()
    found, t_lsh = t(lsh)
    rows.append(
        (f"near-dup (found {exact} pairs)", f"MinHash LSH ({found} verified)", t_lsh, "exact all-co-occurring pairs", t_exact)
    )

    # ---------------- ANN: IVF probe-1 vs brute force (+recall)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 116))
    corpus = emb.where(F.col("vec_id") >= 116)
    cents = emb.where(F.col("vec_id") < 16)
    bf, t_bf = t(lambda: cosine_topk(corpus, queries, "embedding", "vec_id", 10).collect())
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf}
    for nprobe in (1, 4):
        ivf, t_ivf = t(
            lambda: ivf_topk(corpus, queries, cents, "embedding", "vec_id", 10, nprobe=nprobe).collect()
        )
        ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf}
        recall = len(bf_set & ivf_set) / len(bf_set)
        rows.append(
            (
                f"ANN top-10 (recall {recall:.2f})",
                f"IVF-16 probe-{nprobe}",
                t_ivf,
                "brute-force cosine",
                t_bf,
            )
        )

    # trained (k-means||) vs seeded centroids: same nprobe, recall must
    # not regress (VERDICT r1 #6 acceptance)
    trained = train_centroids(corpus, "embedding", "vec_id", k=16, seed=7).persist()
    trained.count()
    seeded_recalls, trained_recalls = {}, {}
    for nprobe in (1, 4):
        s = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(corpus, queries, cents, "embedding", "vec_id", 10, nprobe=nprobe).collect()
        }
        tr, t_tr = t(
            lambda: ivf_topk(corpus, queries, trained, "embedding", "vec_id", 10, nprobe=nprobe).collect()
        )
        tr_set = {(r["query_id"], r["neighbor_id"]) for r in tr}
        seeded_recalls[nprobe] = len(bf_set & s) / len(bf_set)
        trained_recalls[nprobe] = len(bf_set & tr_set) / len(bf_set)
        rows.append(
            (
                f"ANN top-10 probe-{nprobe} (recall {trained_recalls[nprobe]:.2f} vs seeded {seeded_recalls[nprobe]:.2f})",
                "k-means|| trained IVF-16",
                t_tr,
                "brute-force cosine",
                t_bf,
            )
        )
    assert all(
        trained_recalls[np_] >= seeded_recalls[np_] - 1e-9 for np_ in (1, 4)
    ), f"trained centroids regressed recall: {trained_recalls} vs {seeded_recalls}"

    # sampled-fit vs full-fit training (VERDICT r2 #7 acceptance):
    # recall@10 at the same nprobe must be within noise of the full fit
    sampled, t_sfit = t(
        lambda: train_centroids(
            corpus, "embedding", "vec_id", k=16, seed=7, sample_fraction=0.25
        ).persist()
    )
    sampled.count()
    for nprobe in (1, 4):
        sm, t_sm = t(
            lambda: ivf_topk(corpus, queries, sampled, "embedding", "vec_id", 10, nprobe=nprobe).collect()
        )
        sm_recall = len(bf_set & {(r["query_id"], r["neighbor_id"]) for r in sm}) / len(bf_set)
        rows.append(
            (
                f"ANN top-10 probe-{nprobe} (recall {sm_recall:.2f} vs full-fit {trained_recalls[nprobe]:.2f})",
                "25%-sample k-means|| IVF-16",
                t_sm,
                "brute-force cosine",
                t_bf,
            )
        )
        assert sm_recall >= trained_recalls[nprobe] - 0.10, (
            f"sampled training fell outside noise: {sm_recall} vs {trained_recalls[nprobe]}"
        )

    # ---------------- repeated join: bucketed vs plain (broadcast off)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    od = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "bb_lineitem", "l_orderkey", 8)
    write_bucketed(od, "bb_orders", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain, t_plain = t(
            lambda: li.join(od, li.l_orderkey == od.o_orderkey).count()
        )
        bjoin = lambda: bucketed_join(
            spark, "bb_lineitem", "bb_orders",
            spark.table("bb_lineitem").l_orderkey == spark.table("bb_orders").o_orderkey,
        ).count()
        bucketed, t_bucket = t(bjoin)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert plain == bucketed
    rows.append(("fact⋈fact join (SMJ)", "pre-bucketed (0 exchanges)", t_bucket, "shuffle join", t_plain))

    # ---------------- skewed aggregation join: salted vs plain
    skewed = spark.range(0, 2_000_000).select(
        F.when(F.col("id") % 10 < 8, F.lit(1)).otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 1000).select(F.col("id").alias("dk"), (F.col("id") * 2).alias("dv"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p, t_p = t(lambda: skewed.join(dim, skewed.k == dim.dk).agg(F.sum("dv")).collect())
        s, t_s = t(
            lambda: salted_join(skewed, dim, "k", "dk", 8).agg(F.sum("dv")).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert p == s
    rows.append(("80%-hot-key join (2M rows)", "salted ×8", t_s, "plain shuffle join", t_p))

    # ---------------- LSH verify: packed-array vs exploded (round 4)
    sigs_p = minhash_signatures(sh, 6).persist()
    sigs_p.count()
    cands_p = lsh_candidate_pairs(sigs_p, 3, 2).persist()
    cands_p.count()
    packed, t_packed = t(lambda: jaccard_for_pairs(cands_p, sh, 0.8).count())

    def exploded_verify() -> int:
        cand_ids = (
            cands_p.select(F.col("id1").alias("id"))
            .unionByName(cands_p.select(F.col("id2").alias("id")))
            .distinct()
        )
        shc = sh.join(F.broadcast(cand_ids), "id", "left_semi")
        sizes = shc.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        inter = (
            cands_p.join(shc.alias("a"), F.col("id1") == F.col("a.id"))
            .join(
                shc.alias("b"),
                (F.col("id2") == F.col("b.id")) & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        jac = (
            inter.join(sizes.withColumnsRenamed({"id": "id1", "sz": "sz1"}), "id1")
            .join(sizes.withColumnsRenamed({"id": "id2", "sz": "sz2"}), "id2")
            .withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.col("sz1") + F.col("sz2") - F.col("inter")),
            )
        )
        return jac.where(F.col("jaccard") >= 0.8).count()

    expl, t_expl = t(exploded_verify)
    assert packed == expl, (packed, expl)
    rows.append(
        ("LSH verify", "packed-array intersect (1 agg + 2 joins)", t_packed,
         "exploded pair×shingle (4 shuffles)", t_expl)
    )

    # ---------------- simhash bit vote: shiftright+AND(1) vs mask+cmp
    from kcore_spark.operators.dedup import simhash as simhash_current

    cur, t_cur = t(
        lambda: simhash_current(docs, "doc_id", "text", 32).agg(F.sum("simhash")).collect()
    )

    def mask_variant():
        from kcore_spark.operators.text import WORD_SPLIT

        ws = F.filter(F.split(F.col("text"), WORD_SPLIT), lambda x: x != "")
        word_df = docs.select(F.col("doc_id").alias("id"), F.explode(ws).alias("w")).distinct()
        hashed = word_df.select(
            "id", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("h")
        )
        vote_cols = [
            F.sum(
                (F.col("h").bitwiseAND(F.lit(1 << b).cast("long")) != 0).cast("long") * 2 - 1
            ).alias(f"v{b}")
            for b in range(32)
        ]
        summed = hashed.groupBy("id").agg(*vote_cols)
        fp = sum(
            [F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
             for b in range(32)],
            F.lit(0).cast("long"),
        )
        return summed.select("id", fp.alias("simhash")).agg(F.sum("simhash")).collect()

    old, t_old = t(mask_variant)
    assert cur == old
    rows.append(("simhash 32-bit votes", "shiftright+AND(1)", t_cur, "mask+compare+cast", t_old))

    print("| operator | scale path | time | naive path | time |")
    print("|---|---|---|---|---|")
    for name, a, ta, b, tb in rows:
        print(f"| {name} | {a} | {ta:.1f}s | {b} | {tb:.1f}s |")


if __name__ == "__main__":
    main()

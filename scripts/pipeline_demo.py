#!/usr/bin/env python3
"""Training-data pipeline demo: the engine's LLM-data ops composed the
way a 100 TB curation job would run them.

    raw documents
      → exact dedup (sha256 canonical pick)
      → near-dup removal (MinHash LSH candidates + Jaccard verify,
        keep lowest doc_id per duplicate cluster)
      → containment sweep (subset duplication Jaccard misses)
      → quality filter (length/punctuation/stopword score)
      → classifier gate (linear-head batch inference over embeddings)
      → train/eval split + exact-copy leakage audit
      → language balance report + token accounting
      → embedding join + per-label centroids (for downstream sampling)

Usage: python scripts/pipeline_demo.py [sf_dir]
Prints one JSON line per stage with row counts (machine-checkable;
tests/test_pipeline_demo.py asserts the invariants).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from kcore_spark.operators.text import quality_score, token_count
from kcore_spark.testing import shared_spark


def run(sf_dir: str) -> dict[str, int]:
    spark = shared_spark()
    stats: dict[str, int] = {}

    docs = load_table(spark, sf_dir, "documents")
    stats["raw"] = docs.count()

    # 1. exact dedup: keep min doc_id per identical text
    exact = (
        docs.withColumn("h", F.sha2("text", 256))
        .withColumn("canonical", F.min("doc_id").over(Window.partitionBy("h")))
        .where(F.col("doc_id") == F.col("canonical"))
        .drop("h", "canonical")
    )
    stats["after_exact_dedup"] = exact.count()

    # 2. near-dup removal: LSH candidates → Jaccard ≥ 0.8 verify →
    #    drop the higher doc_id of each verified pair
    sh = word_shingles(exact, "doc_id", "text", 3).persist()
    sigs = minhash_signatures(sh, 6)
    cands = lsh_candidate_pairs(sigs, 3, 2)
    dups = cands.join(jaccard_pairs(sh, 0.8), ["id1", "id2"]).select(
        F.col("id2").alias("doc_id")
    ).distinct()
    deduped = exact.join(dups, "doc_id", "left_anti")
    stats["after_near_dedup"] = deduped.count()

    # 2b. containment sweep: drop docs ≥60%-contained in a surviving
    #     larger doc (the subset-duplication Jaccard's symmetric score
    #     under-counts)
    from kcore_spark.operators.dedup import containment_pairs

    sh_left = sh.join(
        deduped.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )
    contained = (
        containment_pairs(sh_left, min_containment=0.6, max_df=10_000)
        .select(F.col("src_id").alias("doc_id"))
        .distinct()
    )
    deduped = deduped.join(contained, "doc_id", "left_anti")
    stats["after_containment"] = deduped.count()

    # 3. quality filter
    scored = deduped.withColumn("q", quality_score("text", "n_chars"))
    kept = scored.where(F.col("q") >= 0.5)
    stats["after_quality_filter"] = kept.count()

    # 3b. classifier gate: linear-head sigmoid over embeddings (the
    #     fastText-style quality model), keep score ≥ 0.3
    emb_all = load_table(sf_dir=sf_dir, spark=spark, name="embeddings")
    w = F.array(*[F.lit(((7 * i + 3) % 19 - 9) / 30.0) for i in range(64)])
    logit = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) + F.lit(0.1)
    passed = emb_all.select(
        F.col("vec_id").alias("doc_id"),
        (1.0 / (1.0 + F.exp(-logit))).alias("clf"),
    ).where(F.col("clf") >= 0.3)
    kept = kept.join(passed, "doc_id", "left_semi")
    stats["after_classifier_gate"] = kept.count()

    # 3c. split + leakage audit: deterministic hash split, then count
    #     eval docs sharing exact text with train (must be 0 after the
    #     dedup stages — the pipeline's own consistency check)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 10
    split = kept.withColumn("is_train", bucket < 8).withColumn(
        "h", F.sha2("text", 256)
    )
    train_h = split.where("is_train").select("h").distinct()
    leaked = split.where(~F.col("is_train")).join(train_h, "h", "left_semi")
    stats["eval_leaked"] = leaked.count()

    # 4. language balance + token accounting
    report = (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(token_count("text")).alias("tokens"),
        )
        .orderBy("lang")
    )
    stats["languages"] = report.count()
    stats["total_tokens"] = int(
        report.agg(F.sum("tokens")).collect()[0][0]
    )

    # 5. join embeddings (doc_id ↔ vec_id 1:1 per FIXTURES) + centroids
    emb = load_table(spark, sf_dir, "embeddings")
    with_vecs = kept.join(emb, kept.doc_id == emb.vec_id)
    stats["with_embeddings"] = with_vecs.count()
    centroids = (
        with_vecs.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
    )
    stats["centroid_rows"] = centroids.count()
    return stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    for stage, n in run(sf_dir).items():
        print(json.dumps({"stage": stage, "value": n}))


if __name__ == "__main__":
    main()

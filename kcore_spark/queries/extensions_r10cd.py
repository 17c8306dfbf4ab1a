"""Round-10 surface extensions, batch CD (SURVEY §2.3 N r10): the
entity-resolution blocking-quality block — the metrics an ER/dedup
pipeline needs BEFORE it runs comparisons. Reduction ratio + pairs
completeness of a sign-bit blocking scheme against the labeled truth
(how many comparisons does blocking save, and how many true matches
does it keep reachable?), block-size skew (the hot-block report: one
oversized block turns a blocked join quadratic), and the blocking-key
sweep (4/8/12 sign bits: the RR-vs-PC tradeoff curve). Completes the
dedup family next to q_minhash_lsh_pairs / q_neardup_threshold_sweep /
q_sample_pair_estimate.

Blocks: sign bits of the first k embedding dimensions (byte-exact in
both engines — no thresholds, no floats in the key). Truth pairs:
same label.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: every metric is COUNT algebra — sum of C(n,2) over
group-by counts; no pair is ever enumerated.
Scale: this is the point — RR/PC/skew all collapse to block- and
label-count tables (group-bys on bounded keys), so the audit costs
one scan regardless of corpus size, while the naive pair-based
definition is quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_BITS = 8
_SWEEP_BITS = [4, 8, 12]


def _block(e: Column, bits: int) -> Column:
    b = F.lit(0).cast("long")
    for i in range(bits):
        b = b + F.when(F.element_at(e, i + 1) > 0, F.lit(1 << i)).otherwise(0)
    return b


def _block_sql(bits: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def _pairs(n: Column) -> Column:
    return (n * (n - 1) / 2).cast("long")


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _block(F.col("embedding"), _BITS).alias("blk")
    )
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cand = emb.groupBy("blk").agg(F.count(F.lit(1)).alias("nb")).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(_pairs(F.col("nb"))).cast("long").alias("cand_pairs"),
    )
    truth = emb.groupBy("label").agg(F.count(F.lit(1)).alias("nl")).agg(
        F.sum(_pairs(F.col("nl"))).cast("long").alias("true_pairs")
    )
    hit = emb.groupBy("label", "blk").agg(F.count(F.lit(1)).alias("nlb")).agg(
        F.sum(_pairs(F.col("nlb"))).cast("long").alias("true_coblocked")
    )
    j = tot.crossJoin(cand).crossJoin(truth).crossJoin(hit)
    all_pairs = _pairs(F.col("n")).cast("double")
    rr = 1.0 - F.col("cand_pairs").cast("double") / all_pairs
    pc = F.col("true_coblocked").cast("double") / F.col("true_pairs")
    return j.select(
        "n",
        "n_blocks",
        "cand_pairs",
        "true_pairs",
        "true_coblocked",
        F.round(rr, 6).alias("reduction_ratio"),
        F.round(pc, 6).alias("pairs_completeness"),
        F.round(2.0 * rr * pc / (rr + pc), 6).alias("f_blocking"),
    )


Q_BQ_SQL = f"""
WITH emb AS (
  SELECT vec_id, label, {_block_sql(_BITS)} AS blk FROM embeddings),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM emb),
cand AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(CAST(nb * (nb - 1) / 2 AS BIGINT)) AS BIGINT) AS cand_pairs
  FROM (SELECT blk, COUNT(*) AS nb FROM emb GROUP BY blk)),
truth AS (
  SELECT CAST(SUM(CAST(nl * (nl - 1) / 2 AS BIGINT)) AS BIGINT) AS true_pairs
  FROM (SELECT label, COUNT(*) AS nl FROM emb GROUP BY label)),
hit AS (
  SELECT CAST(SUM(CAST(nlb * (nlb - 1) / 2 AS BIGINT)) AS BIGINT)
             AS true_coblocked
  FROM (SELECT label, blk, COUNT(*) AS nlb FROM emb GROUP BY 1, 2))
SELECT n, n_blocks, cand_pairs, true_pairs, true_coblocked,
       ROUND(1.0 - cand_pairs / CAST(n * (n - 1) / 2 AS DOUBLE), 6)
           AS reduction_ratio,
       ROUND(true_coblocked / CAST(true_pairs AS DOUBLE), 6)
           AS pairs_completeness,
       ROUND(2.0 * (1.0 - cand_pairs / CAST(n * (n - 1) / 2 AS DOUBLE))
                 * (true_coblocked / CAST(true_pairs AS DOUBLE))
             / ((1.0 - cand_pairs / CAST(n * (n - 1) / 2 AS DOUBLE))
                + (true_coblocked / CAST(true_pairs AS DOUBLE))), 6)
           AS f_blocking
FROM tot CROSS JOIN cand CROSS JOIN truth CROSS JOIN hit
"""

QUERIES["q_blocking_quality"] = QuerySpec(
    q_blocking_quality,
    Q_BQ_SQL,
    "blocking reduction ratio + pairs completeness vs labeled truth — "
    "pure count algebra, no pair enumeration",
)


# ---------------------------------------------------- block-size skew
# Hot-block report: max/mean block size, share of candidate pairs owned
# by the largest block, and the Gini of block sizes.


def q_block_size_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        _block(F.col("embedding"), _BITS).alias("blk")
    )
    sizes = emb.groupBy("blk").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    # Gini over block sizes via the count-of-counts domain (sizes are
    # small integers; multiplicity table is value-bounded)
    cc = sizes.groupBy("nb").agg(F.count(F.lit(1)).cast("long").alias("m"))
    agg = cc.agg(
        F.sum("m").cast("long").alias("k"),
        F.sum(F.col("m") * F.col("nb")).cast("long").alias("s1"),
        F.sum(F.col("m") * F.col("nb") * F.col("nb")).cast("long").alias("s2"),
        F.sum(
            F.col("m") * F.col("nb") * (F.col("nb") - 1) / 2
        ).cast("long").alias("pairs"),
        F.max(F.col("nb")).alias("max_b"),
    )
    # Gini = sum_i sum_j |x_i - x_j| / (2 k^2 mean) — over the cc domain:
    # sum |a-b| m_a m_b via a bounded self-join on the multiplicity table
    a = cc.select(F.col("nb").alias("a"), F.col("m").alias("ma"))
    b = cc.select(F.col("nb").alias("b"), F.col("m").alias("mb"))
    absdiff = a.crossJoin(b).agg(
        F.sum(F.abs(F.col("a") - F.col("b")) * F.col("ma") * F.col("mb"))
        .cast("long")
        .alias("s_abs")
    )
    j = agg.crossJoin(F.broadcast(absdiff))
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    max_pairs = (F.col("max_b") * (F.col("max_b") - 1) / 2).cast("double")
    return j.select(
        F.col("k").alias("n_blocks"),
        F.col("max_b").alias("max_block"),
        F.round(mean, 4).alias("mean_block"),
        F.round(max_pairs / F.col("pairs").cast("double"), 6).alias(
            "max_block_pair_share"
        ),
        F.round(
            F.col("s_abs").cast("double") / (2.0 * kd * kd * mean), 6
        ).alias("gini_block_sizes"),
    )


Q_SKEW_SQL = f"""
WITH emb AS (SELECT {_block_sql(_BITS)} AS blk FROM embeddings),
sizes AS (SELECT blk, CAST(COUNT(*) AS BIGINT) AS nb FROM emb GROUP BY blk),
cc AS (SELECT nb, CAST(COUNT(*) AS BIGINT) AS m FROM sizes GROUP BY nb),
agg AS (
  SELECT CAST(SUM(m) AS BIGINT) AS k,
         CAST(SUM(m * nb) AS BIGINT) AS s1,
         CAST(SUM(m * nb * (nb - 1) / 2) AS BIGINT) AS pairs,
         MAX(nb) AS max_b
  FROM cc),
absdiff AS (
  SELECT CAST(SUM(ABS(a.nb - b.nb) * a.m * b.m) AS BIGINT) AS s_abs
  FROM cc a, cc b)
SELECT k AS n_blocks, max_b AS max_block,
       ROUND(CAST(s1 AS DOUBLE) / k, 4) AS mean_block,
       ROUND(CAST(max_b * (max_b - 1) / 2 AS DOUBLE) / CAST(pairs AS DOUBLE), 6)
           AS max_block_pair_share,
       ROUND(CAST(s_abs AS DOUBLE)
             / (2.0 * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                * (CAST(s1 AS DOUBLE) / k)), 6) AS gini_block_sizes
FROM agg CROSS JOIN absdiff
"""

QUERIES["q_block_size_skew"] = QuerySpec(
    q_block_size_skew,
    Q_SKEW_SQL,
    "hot-block skew report: max block, pair share, Gini of block sizes "
    "— count-of-counts domain, bounded self-join",
)


# --------------------------------------------------- blocking-key sweep
# RR vs PC at 4/8/12 sign bits — the blocking tradeoff curve.


def q_blocking_key_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    frames = []
    for bits in _SWEEP_BITS:
        e = emb.select(
            F.lit(bits).alias("bits"),
            "label",
            _block(F.col("embedding"), bits).alias("blk"),
        )
        frames.append(e)
    tagged = frames[0]
    for f in frames[1:]:
        tagged = tagged.unionByName(f)
    tot = tagged.groupBy("bits").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cand = (
        tagged.groupBy("bits", "blk")
        .agg(F.count(F.lit(1)).alias("nb"))
        .groupBy("bits")
        .agg(F.sum(_pairs(F.col("nb"))).cast("long").alias("cand_pairs"))
    )
    truth = (
        tagged.groupBy("bits", "label")
        .agg(F.count(F.lit(1)).alias("nl"))
        .groupBy("bits")
        .agg(F.sum(_pairs(F.col("nl"))).cast("long").alias("true_pairs"))
    )
    hit = (
        tagged.groupBy("bits", "label", "blk")
        .agg(F.count(F.lit(1)).alias("nlb"))
        .groupBy("bits")
        .agg(F.sum(_pairs(F.col("nlb"))).cast("long").alias("true_coblocked"))
    )
    j = tot.join(cand, "bits").join(truth, "bits").join(hit, "bits")
    all_pairs = _pairs(F.col("n")).cast("double")
    return j.select(
        "bits",
        "cand_pairs",
        F.round(1.0 - F.col("cand_pairs").cast("double") / all_pairs, 6).alias(
            "reduction_ratio"
        ),
        F.round(
            F.col("true_coblocked").cast("double") / F.col("true_pairs"), 6
        ).alias("pairs_completeness"),
    ).orderBy("bits")


_SWEEP_ARM_SQL = " UNION ALL ".join(
    f"SELECT {bits} AS bits, label, {_block_sql(bits)} AS blk FROM embeddings"
    for bits in _SWEEP_BITS
)
Q_SWEEP_SQL = f"""
WITH tagged AS ({_SWEEP_ARM_SQL}),
tot AS (SELECT bits, CAST(COUNT(*) AS BIGINT) AS n FROM tagged GROUP BY bits),
cand AS (
  SELECT bits, CAST(SUM(CAST(nb * (nb - 1) / 2 AS BIGINT)) AS BIGINT)
             AS cand_pairs
  FROM (SELECT bits, blk, COUNT(*) AS nb FROM tagged GROUP BY 1, 2)
  GROUP BY bits),
truth AS (
  SELECT bits, CAST(SUM(CAST(nl * (nl - 1) / 2 AS BIGINT)) AS BIGINT)
             AS true_pairs
  FROM (SELECT bits, label, COUNT(*) AS nl FROM tagged GROUP BY 1, 2)
  GROUP BY bits),
hit AS (
  SELECT bits, CAST(SUM(CAST(nlb * (nlb - 1) / 2 AS BIGINT)) AS BIGINT)
             AS true_coblocked
  FROM (SELECT bits, label, blk, COUNT(*) AS nlb FROM tagged GROUP BY 1, 2, 3)
  GROUP BY bits)
SELECT tot.bits AS bits, cand_pairs,
       ROUND(1.0 - cand_pairs / CAST(n * (n - 1) / 2 AS DOUBLE), 6)
           AS reduction_ratio,
       ROUND(true_coblocked / CAST(true_pairs AS DOUBLE), 6)
           AS pairs_completeness
FROM tot
JOIN cand ON tot.bits = cand.bits
JOIN truth ON tot.bits = truth.bits
JOIN hit ON tot.bits = hit.bits
ORDER BY bits
"""

QUERIES["q_blocking_key_sweep"] = QuerySpec(
    q_blocking_key_sweep,
    Q_SWEEP_SQL,
    "blocking tradeoff curve at 4/8/12 sign bits — RR vs PC per scheme, "
    "one tagged union, count algebra only",
)

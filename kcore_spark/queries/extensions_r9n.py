"""Round-9 surface extensions, batch N (SURVEY §2.3 N r9): the
dedup-TUNING loop — a threshold→pair-count sweep over the blocked
exact-cosine pair table (pick τ from the curve, not folklore), the
cross-source near-duplicate overlap matrix (WHICH corpora duplicate
each other — the curation decision behind source weights), and
expected calibration error (the 1-row summary the q_brier_calibration
reliability table feeds).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
All three reuse established pair/score machinery: the pair space is
blocked (Σ|block|², never corpus²) and the eval buckets are
decimal-rounded before grouping so both engines bucket identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.similarity import NORM_CTE, with_norm

QUERIES: dict[str, QuerySpec] = {}


def _blocked_pairs(spark: SparkSession, sf_dir: str, tau: float) -> DataFrame:
    """Label-blocked exact-cosine pairs ≥ tau (the q_embedding_neardup
    shape, shared so the sweep and the overlap matrix pay one
    codepath)."""
    from kcore_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    n = with_norm(emb, "embedding", "vec_id").join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    a = n.withColumnsRenamed({"id": "id1", "e": "e1", "nrm": "n1"})
    b = n.select(
        F.col("id").alias("id2"), F.col("e").alias("e2"),
        F.col("nrm").alias("n2"), "label",
    )
    return (
        a.join(b, "label")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "label", "id1", "id2",
            cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= tau)
    )


# ---------------------- near-dup threshold sweep (the tuning curve)
# Pair count and affected-document count per threshold bucket
# τ ∈ {0.3, 0.4, …, 0.9} from ONE pair materialization — the curve a
# curation run reads before committing to a dedup threshold. The
# similarity is rounded to 10 decimals (decimal cast) before
# bucketing so a boundary sim can't bucket differently across
# engines.


def q_neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _blocked_pairs(spark, sf_dir, 0.3).select(
        "id1", "id2", F.round(F.col("cos_sim"), 10).cast("decimal(28,10)").alias("s")
    ).localCheckpoint()
    taus = spark.range(3, 10).select((F.col("id") / 10.0).alias("tau"))
    swept = pairs.crossJoin(F.broadcast(taus)).where(
        F.col("s") >= F.col("tau").cast("decimal(28,10)")
    )
    ids = swept.select("tau", F.col("id1").alias("i")).unionByName(
        swept.select("tau", F.col("id2").alias("i"))
    )
    counts = (
        swept.groupBy("tau")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .join(
            ids.groupBy("tau").agg(
                F.count_distinct("i").cast("long").alias("n_docs_affected")
            ),
            "tau",
        )
    )
    # keep EMPTY thresholds as explicit zero rows — the curve's tail
    # ("nothing survives τ ≥ 0.5") is itself the tuning signal
    return (
        taus.join(counts, "tau", "left")
        .na.fill({"n_pairs": 0, "n_docs_affected": 0})
        .orderBy("tau")
    )


Q_SWEEP_SQL = f"""
WITH {NORM_CTE},
nl AS (SELECT n.vec_id, n.e, n.nrm, emb.label
       FROM n JOIN embeddings emb ON emb.vec_id = n.vec_id),
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         CAST(ROUND(list_inner_product(a.e, b.e) / (a.nrm * b.nrm), 10)
              AS DECIMAL(28,10)) AS s
  FROM nl a JOIN nl b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.3),
taus AS (SELECT unnest(range(3, 10)) / 10.0 AS tau),
swept AS (
  SELECT tau, id1, id2 FROM pairs CROSS JOIN taus
  WHERE s >= CAST(tau AS DECIMAL(28,10))),
pair_counts AS (
  SELECT tau, COUNT(*) AS n_pairs FROM swept GROUP BY tau),
doc_counts AS (
  SELECT tau, COUNT(DISTINCT i) AS n_docs_affected
  FROM (SELECT tau, id1 AS i FROM swept
        UNION ALL SELECT tau, id2 FROM swept)
  GROUP BY tau)
SELECT taus.tau, CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(n_docs_affected, 0) AS BIGINT) AS n_docs_affected
FROM taus
LEFT JOIN pair_counts ON taus.tau = pair_counts.tau
LEFT JOIN doc_counts ON taus.tau = doc_counts.tau
ORDER BY taus.tau
"""

QUERIES["q_neardup_threshold_sweep"] = QuerySpec(
    q_neardup_threshold_sweep,
    Q_SWEEP_SQL,
    "near-dup threshold tuning curve: pairs + affected docs per "
    "τ ∈ {0.3..0.9} from one blocked pair materialization",
)


# ------------------ cross-source near-duplicate overlap matrix
# For every (source_a, source_b) pair: how many near-dup pairs cross
# them — the matrix behind 'drop source B, it is 80% source A'. Doc
# identity proxies through vec_id = doc_id (the fixture convention the
# ANN family already uses); the pair table is the same blocked-cosine
# shape.


def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _blocked_pairs(spark, sf_dir, 0.35).select("id1", "id2")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source"
    )
    tagged = (
        pairs.join(docs.withColumnsRenamed({"id": "id1", "source": "src1"}), "id1")
        .join(docs.withColumnsRenamed({"id": "id2", "source": "src2"}), "id2")
        .select(
            F.least("src1", "src2").alias("source_a"),
            F.greatest("src1", "src2").alias("source_b"),
        )
    )
    return (
        tagged.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardup_pairs"))
        .orderBy("source_a", "source_b")
    )


Q_OVERLAP_SQL = f"""
WITH {NORM_CTE},
nl AS (SELECT n.vec_id, n.e, n.nrm, emb.label
       FROM n JOIN embeddings emb ON emb.vec_id = n.vec_id),
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2
  FROM nl a JOIN nl b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.35),
tagged AS (
  SELECT LEAST(d1.source, d2.source) AS source_a,
         GREATEST(d1.source, d2.source) AS source_b
  FROM pairs
  JOIN documents d1 ON pairs.id1 = d1.doc_id
  JOIN documents d2 ON pairs.id2 = d2.doc_id)
SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_neardup_pairs
FROM tagged
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""

QUERIES["q_cross_source_overlap"] = QuerySpec(
    q_cross_source_overlap,
    Q_OVERLAP_SQL,
    "cross-source near-duplicate overlap matrix (which corpora "
    "duplicate each other) over the blocked cosine pair table",
)


# --------------------------- expected calibration error (1-row)
# ECE = Σ_b (n_b/N)·|acc_b − conf_b| over 10 equal-width probability
# buckets — the single number the q_brier_calibration reliability
# table visualizes. Same pinned sigmoid scorer (shared weights) so
# the two queries describe one model; bucket assignment reuses the
# row-level decimal round.

from kcore_spark.queries.extensions_r8 import _CAL_W  # noqa: E402
from kcore_spark.operators.similarity import as_double  # noqa: E402


def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(c) for c in _CAL_W])
    x = as_double(F.col("embedding"))
    logit = F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    p = 1.0 / (1.0 + F.exp(-logit))
    scored = emb.select(
        F.least(F.floor(p * 10).cast("long"), F.lit(9)).alias("bucket"),
        F.round(p, 10).cast("decimal(28,10)").alias("pd"),
        (F.col("label") >= 5).cast("int").alias("pos"),
    )
    per_b = scored.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("pos").alias("pos_b"),
        F.sum("pd").alias("conf_sum"),
    )
    return per_b.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.round(
            F.sum(
                F.abs(
                    F.col("pos_b") / F.col("n_b")
                    - F.col("conf_sum").cast("double") / F.col("n_b")
                )
                * F.col("n_b")
            )
            / F.sum("n_b"),
            6,
        ).alias("ece"),
    )


_CAL_W_SQL = ", ".join(str(c) for c in _CAL_W)

Q_ECE_SQL = f"""
WITH scored AS (
  SELECT LEAST(CAST(FLOOR((1.0 / (1.0 + EXP(-list_reduce(list_prepend(0.0,
           list_transform(list_zip(embedding::DOUBLE[], [{_CAL_W_SQL}]),
                          p -> p[1] * p[2])), (a, b) -> a + b)))) * 10) AS BIGINT), 9)
           AS bucket,
         CAST(ROUND(1.0 / (1.0 + EXP(-list_reduce(list_prepend(0.0,
           list_transform(list_zip(embedding::DOUBLE[], [{_CAL_W_SQL}]),
                          p -> p[1] * p[2])), (a, b) -> a + b))), 10)
              AS DECIMAL(28,10)) AS pd,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings),
per_b AS (
  SELECT bucket, COUNT(*) AS n_b, SUM(pos) AS pos_b, SUM(pd) AS conf_sum
  FROM scored GROUP BY bucket)
SELECT CAST(SUM(n_b) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(SUM(ABS(pos_b * 1.0 / n_b - CAST(conf_sum AS DOUBLE) / n_b) * n_b)
             / SUM(n_b), 6) AS ece
FROM per_b
"""

QUERIES["q_ece"] = QuerySpec(
    q_ece,
    Q_ECE_SQL,
    "expected calibration error: the 1-row summary of the "
    "q_brier_calibration reliability buckets (shared pinned scorer)",
)

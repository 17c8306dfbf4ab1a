"""Training-data sampling beyond uniform: deterministic weighted
sampling (domain reweighting) and per-source quotas — the mixture
machinery an LLM pre-training pipeline runs after curation.

Both are built on the portable md5-uniform (the q_hash_sample idiom):
u(doc) = first 8 hex digits of md5(doc_id) scaled into (0,1], identical
on Spark and DuckDB, so every sampled set is value-checkable — unlike
engine-native RNG sampling, where only size bands can be pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

# md5-uniform in (0, 1]: (h + 1) / 2^32 where h is the first 32 bits
_U_SCALE = 4294967296.0


def _uniform(col):
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double")
    return (h + 1.0) / _U_SCALE


WEIGHTED_K = 200


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    (2006): each doc draws key = u^(1/w); the global top-k by key is a
    weighted sample — here w = n_chars, biasing toward longer
    documents (the shape of domain/temperature reweighting: w comes
    from a mixture table in production).

    Scale: one scan computing (u, key) map-side + a top-k
    (TakeOrderedAndProject — per-partition heaps, no global sort).
    Deterministic: the md5-uniform replaces the RNG, so reruns and the
    oracle produce the identical sample."""
    docs = load_table(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id"))
    key = F.pow(u, 1.0 / F.col("n_chars").cast("double"))
    ranked = docs.select("doc_id", "source", "n_chars", key.alias("es_key"))
    return (
        ranked.orderBy(F.col("es_key").desc(), "doc_id")
        .limit(WEIGHTED_K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("n_chars").cast("long")).alias("sampled_chars"),
        )
        .orderBy("source")
    )


Q_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         POW((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
               / {_U_SCALE:.1f},
             1.0 / n_chars) AS es_key
  FROM documents),
topk AS (SELECT * FROM keyed ORDER BY es_key DESC, doc_id LIMIT {WEIGHTED_K})
SELECT source, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM topk
GROUP BY source
ORDER BY source
"""

QUOTA_PER_SOURCE = 50


def q_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: at most N docs per source, chosen by the
    md5-uniform order (a deterministic 'random' pick). This is the
    cap-the-dominant-domain step of mixture balancing; the windowed
    row_number plans as a per-partition top-k, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(F.col("u").asc(), F.col("doc_id").asc())
    picked = (
        docs.select("doc_id", "source", "n_chars", u.alias("u"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= QUOTA_PER_SOURCE)
    )
    return picked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
        F.min("u").alias("min_u"),
    ).orderBy("source")


Q_SOURCE_QUOTA_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
           / {_U_SCALE:.1f} AS u
  FROM documents),
picked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
  FROM keyed QUALIFY rn <= {QUOTA_PER_SOURCE})
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
       MIN(u) AS min_u
FROM picked
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "q_weighted_sample": QuerySpec(
        q_weighted_sample,
        Q_WEIGHTED_SAMPLE_SQL,
        "Efraimidis-Spirakis weighted sample (portable uniform)",
    ),
    "q_source_quota_sample": QuerySpec(
        q_source_quota_sample, Q_SOURCE_QUOTA_SQL, "per-source quota cap"
    ),
}


# -------------------------------------------------- sample-ratio mismatch


def q_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) check — the first guardrail of any
    A/B system: assign users to arms with the portable hash split
    (expected 50/50), then the chi-square statistic of observed vs
    expected arm sizes. Deterministic end to end: integer counts, the
    statistic computed from them in one expression on both engines. A
    healthy split yields a small statistic; the query surfaces it per
    event_type so a skewed logging path shows up immediately."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2
    )
    counts = (
        ev.select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(
            F.sum((arm == 0).cast("long")).alias("n_a"),
            F.sum((arm == 1).cast("long")).alias("n_b"),
        )
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    exp = n / 2.0
    chi2 = (
        (F.col("n_a").cast("double") - exp) * (F.col("n_a").cast("double") - exp) / exp
        + (F.col("n_b").cast("double") - exp) * (F.col("n_b").cast("double") - exp) / exp
    )
    return counts.select(
        "event_type", "n_a", "n_b", F.round(chi2, 9).alias("chi2")
    ).orderBy("event_type")


Q_SRM_SQL = """
WITH assigned AS (
  SELECT DISTINCT event_type, user_id,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm
  FROM events),
counts AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM assigned
  GROUP BY event_type)
SELECT event_type, n_a, n_b,
       ROUND(
         (CAST(n_a AS DOUBLE) - (n_a + n_b) / 2.0) * (CAST(n_a AS DOUBLE) - (n_a + n_b) / 2.0)
           / ((n_a + n_b) / 2.0)
       + (CAST(n_b AS DOUBLE) - (n_a + n_b) / 2.0) * (CAST(n_b AS DOUBLE) - (n_a + n_b) / 2.0)
           / ((n_a + n_b) / 2.0), 9) AS chi2
FROM counts
ORDER BY event_type
"""


QUERIES["q_sample_ratio_mismatch"] = QuerySpec(
    q_sample_ratio_mismatch, Q_SRM_SQL, "chi-square sample-ratio-mismatch guardrail"
)

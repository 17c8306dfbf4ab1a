"""Round-10 surface extensions, batch I (SURVEY §2.3 N r10): the
embedding-hygiene block — the audits a vector pipeline runs before
trusting any ANN index: L2-norm profile per label (unnormalized /
zero vectors break cosine search silently), kNN label-consistency of
a pinned anchor sample (embedding-quality smoke test), and the
per-dimension variance profile (dead dimensions waste index space).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: dot products pair the Spark zip_with/aggregate fold with
DuckDB's list_inner_product on DOUBLE[] (the q_cosine_topk-proven
idiom); cross-row statistics are decimal sums of rounded per-row
terms; all orderings tie-broken by vec_id / dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import as_double
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _norm2(col):
    x = as_double(col)
    return F.aggregate(
        F.zip_with(x, x, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


# ------------------------------------- embedding L2-norm audit
# Per label: vector count, decimal-averaged norm, extremes, and the
# counts of zero vectors and of vectors whose norm is off unit by
# more than 1% — the two defects that silently corrupt cosine search.
# One map-side fold per row + a keyed rollup.


def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.sqrt(_norm2(F.col("embedding"))).alias("nrm")
    )
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(
                F.avg(F.round(F.col("nrm"), 8).cast("decimal(18,8)")).cast("double"),
                6,
            ).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.sum((F.col("nrm") == 0).cast("int")).cast("long").alias("n_zero"),
            F.sum((F.abs(F.col("nrm") - 1.0) > 0.01).cast("int"))
            .cast("long")
            .alias("n_off_unit"),
        )
        .orderBy("label")
    )


Q_NORM_SQL = """
WITH e AS (
  SELECT label,
         SQRT(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(AVG(CAST(ROUND(nrm, 8) AS DECIMAL(18,8))) AS DOUBLE), 6)
         AS avg_norm,
       ROUND(MIN(nrm), 6) AS min_norm,
       ROUND(MAX(nrm), 6) AS max_norm,
       CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(SUM(CASE WHEN ABS(nrm - 1.0) > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_off_unit
FROM e
GROUP BY label
ORDER BY label
"""

QUERIES["q_embedding_norm_audit"] = QuerySpec(
    q_embedding_norm_audit,
    Q_NORM_SQL,
    "L2-norm audit per label (zero / off-unit vector counts, "
    "decimal-averaged norms) — the pre-ANN hygiene check",
)


# ------------------------------ kNN label consistency (anchors)
# For a pinned anchor sample (vec_id % 97 == 0): the 5 nearest
# neighbors by cosine (self excluded), their majority label vs the
# anchor's own — the cheapest embedding-quality smoke test. Scale
# shape: bounded anchor set broadcast against the corpus (the
# q_cosine_topk shape), keyed top-k window per anchor.

_KNN_K = 5


def q_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", F.sqrt(_norm2(F.col("e"))))
    anchors = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("e").alias("a_e"),
        F.col("nrm").alias("a_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_e"), F.col("e"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = (
        F.broadcast(anchors)
        .crossJoin(emb)
        .where(F.col("vec_id") != F.col("a_id"))
        .select(
            "a_id",
            "a_label",
            "vec_id",
            "label",
            F.round(dot / (F.col("a_nrm") * F.col("nrm")), 8).alias("sim"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    top = sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= _KNN_K)
    votes = top.groupBy("a_id", "a_label", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("a_id").orderBy(F.col("c").desc(), F.col("label"))
    maj = votes.withColumn("vr", F.row_number().over(wv)).where(F.col("vr") == 1)
    return maj.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.sum((F.col("label") == F.col("a_label")).cast("int"))
        .cast("long")
        .alias("n_consistent"),
        F.round(
            F.sum((F.col("label") == F.col("a_label")).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("consistency_rate"),
    )


Q_KNN_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ee,
         SQRT(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings),
anchors AS (
  SELECT vec_id AS a_id, label AS a_label, ee AS a_e, nrm AS a_nrm
  FROM e WHERE vec_id % 97 = 0),
sims AS (
  SELECT a.a_id, a.a_label, e.vec_id, e.label,
         ROUND(list_inner_product(a.a_e, e.ee) / (a.a_nrm * e.nrm), 8) AS sim
  FROM anchors a, e WHERE e.vec_id <> a.a_id),
top AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
              ORDER BY sim DESC, vec_id) AS rk
  FROM sims),
votes AS (
  SELECT a_id, a_label, label, COUNT(*) AS c
  FROM top WHERE rk <= {_KNN_K}
  GROUP BY a_id, a_label, label),
maj AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
              ORDER BY c DESC, label) AS vr
  FROM votes)
SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
       CAST(SUM(CASE WHEN label = a_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_consistent,
       ROUND(SUM(CASE WHEN label = a_label THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS consistency_rate
FROM maj WHERE vr = 1
"""

QUERIES["q_knn_label_consistency"] = QuerySpec(
    q_knn_label_consistency,
    Q_KNN_SQL,
    "5-NN majority-label consistency of a pinned anchor sample "
    "(broadcast anchors x corpus, keyed top-k) — embedding quality",
)


# ---------------------------------- per-dimension variance profile
# Mean/variance per embedding dimension — dead (near-constant) dims
# waste index space and dominate quantization error. One posexplode
# riding the scan, decimal moment sums per dim, top-5 by variance.


def q_dimension_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(as_double(F.col("embedding"))).alias("dim", "v")
    )
    per = emb.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("v"), 8).cast("decimal(28,8)")).alias("s"),
        F.sum(F.round(F.col("v") * F.col("v"), 12).cast("decimal(28,12)")).alias("q"),
    )
    var = (
        F.col("n").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    return (
        per.select(
            F.col("dim").cast("int").alias("dim"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("s").cast("double") / F.col("n"), 8).alias("mean"),
            F.round(var, 10).alias("variance"),
        )
        .orderBy(F.col("variance").desc(), F.col("dim"))
        .limit(5)
    )


Q_DIMVAR_SQL = """
WITH x AS (
  SELECT j - 1 AS dim, CAST(embedding[j] AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS j)),
per AS (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(ROUND(v, 8) AS DECIMAL(28,8))) AS s,
         SUM(CAST(ROUND(v * v, 12) AS DECIMAL(28,12))) AS q
  FROM x GROUP BY dim)
SELECT CAST(dim AS INTEGER) AS dim, CAST(n AS BIGINT) AS n,
       ROUND(CAST(s AS DOUBLE) / n, 8) AS mean,
       ROUND((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1)), 10) AS variance
FROM per
ORDER BY variance DESC, dim
LIMIT 5
"""

QUERIES["q_dimension_variance"] = QuerySpec(
    q_dimension_variance,
    Q_DIMVAR_SQL,
    "per-dimension variance profile of the embedding corpus (decimal "
    "moment sums), top-5 dims — dead-dimension audit",
)

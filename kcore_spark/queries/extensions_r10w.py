"""Round-10 surface extensions, batch W (SURVEY §2.3 N r10): the
embedding linear-algebra block — dimension-pair correlation (feature
redundancy: highly correlated dims waste capacity and break
product-quantization independence assumptions) and label-centroid
confusability (which classes the embedding space cannot separate).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: per-pair moments are decimal sums of rounded element
products; centroid similarities use the proven fold <->
list_inner_product pairing; all orderings tie-broken.

Scale shape: the dim-pair explode is DIMENSION-bounded (64 dims ->
2016 pairs regardless of corpus size, emitted map-side per row); the
centroid matrix is k x k after a keyed mean — neither grows with
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import as_double
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------- dimension-pair correlation (top |r|)
# Pearson r over vectors for every dim pair (i < j) among the FIRST
# 16 dims (120 pairs — the audit slice; the full 2016-pair version is
# the same plan). Decimal moment sums; top-5 by |r|.

_N_DIMS = 16


def q_dim_correlation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        as_double(F.slice(F.col("embedding"), 1, _N_DIMS)).alias("e")
    )
    pairs = []
    for i in range(_N_DIMS):
        for j in range(i + 1, _N_DIMS):
            pairs.append(
                F.struct(
                    F.lit(i).alias("di"),
                    F.lit(j).alias("dj"),
                    F.element_at("e", i + 1).alias("x"),
                    F.element_at("e", j + 1).alias("y"),
                )
            )
    exploded = emb.select(F.explode(F.array(*pairs)).alias("p")).select(
        F.col("p.di").alias("di"),
        F.col("p.dj").alias("dj"),
        F.col("p.x").alias("x"),
        F.col("p.y").alias("y"),
    )
    per = exploded.groupBy("di", "dj").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("x"), 8).cast("decimal(28,8)")).alias("sx"),
        F.sum(F.round(F.col("y"), 8).cast("decimal(28,8)")).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 12).cast("decimal(28,12)")).alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 12).cast("decimal(28,12)")).alias("syy"),
        F.sum(F.round(F.col("x") * F.col("y"), 12).cast("decimal(28,12)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        (n * F.col("sxx").cast("double") - F.col("sx").cast("double") ** 2)
        * (n * F.col("syy").cast("double") - F.col("sy").cast("double") ** 2)
    )
    out = per.select(
        F.col("di").cast("int").alias("dim_i"),
        F.col("dj").cast("int").alias("dim_j"),
        F.round(num / den, 6).alias("pearson_r"),
    )
    return out.orderBy(F.abs(F.col("pearson_r")).desc(), "dim_i", "dim_j").limit(5)


def _dimcorr_sql() -> str:
    pair_rows = ", ".join(
        f"({i}, {j})" for i in range(_N_DIMS) for j in range(i + 1, _N_DIMS)
    )
    return f"""
WITH pairs(di, dj) AS (VALUES {pair_rows}),
x AS (
  SELECT p.di, p.dj,
         CAST(e.embedding[p.di + 1] AS DOUBLE) AS x,
         CAST(e.embedding[p.dj + 1] AS DOUBLE) AS y
  FROM embeddings e, pairs p),
per AS (
  SELECT di, dj, COUNT(*) AS n,
         SUM(CAST(ROUND(x, 8) AS DECIMAL(28,8))) AS sx,
         SUM(CAST(ROUND(y, 8) AS DECIMAL(28,8))) AS sy,
         SUM(CAST(ROUND(x * x, 12) AS DECIMAL(28,12))) AS sxx,
         SUM(CAST(ROUND(y * y, 12) AS DECIMAL(28,12))) AS syy,
         SUM(CAST(ROUND(x * y, 12) AS DECIMAL(28,12))) AS sxy
  FROM x GROUP BY di, dj)
SELECT CAST(di AS INTEGER) AS dim_i, CAST(dj AS INTEGER) AS dim_j,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS pearson_r
FROM per
ORDER BY ABS(pearson_r) DESC, dim_i, dim_j
LIMIT 5
"""


QUERIES["q_dim_correlation_pairs"] = QuerySpec(
    q_dim_correlation_pairs,
    _dimcorr_sql(),
    "top-5 most correlated embedding-dimension pairs (first 16 dims, "
    "decimal moment sums) — feature-redundancy audit",
)


# --------------------------- label-centroid confusability matrix
# Cosine similarity between label centroids — the class pairs an
# embedding-space classifier will confuse. k centroids from one keyed
# mean, k(k-1)/2 pairs; top-5 most similar.


def q_label_confusability(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("dim", "v")
    )
    cent = emb.groupBy("label", "dim").agg(
        F.round(F.avg(F.round(F.col("v"), 8).cast("decimal(28,8)")), 8)
        .cast("double")
        .alias("c")
    )
    a = cent.select(F.col("label").alias("la"), "dim", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("lb"), "dim", F.col("c").alias("cb"))
    prod = (
        a.join(b, "dim")
        .where(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(F.round(F.col("ca") * F.col("cb"), 14).cast("decimal(28,14)"))
            .cast("double")
            .alias("dot")
        )
    )
    norms = (
        cent.groupBy("label")
        .agg(
            F.sqrt(
                F.sum(F.round(F.col("c") * F.col("c"), 14).cast("decimal(28,14)"))
                .cast("double")
            ).alias("nrm")
        )
    )
    na = norms.select(F.col("label").alias("la"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("label").alias("lb"), F.col("nrm").alias("nrm_b"))
    out = (
        prod.join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb")
        .select(
            F.col("la").cast("int").alias("label_a"),
            F.col("lb").cast("int").alias("label_b"),
            F.round(
                F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6
            ).alias("centroid_cosine"),
        )
    )
    return out.orderBy(F.col("centroid_cosine").desc(), "label_a", "label_b").limit(5)


Q_CONFUS_SQL = """
WITH x AS (
  SELECT label, j - 1 AS dim, CAST(embedding[j] AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS j)),
cent AS (
  SELECT label, dim,
         CAST(ROUND(AVG(CAST(ROUND(v, 8) AS DECIMAL(28,8))), 8) AS DOUBLE) AS c
  FROM x GROUP BY label, dim),
prod AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(SUM(CAST(ROUND(a.c * b.c, 14) AS DECIMAL(28,14))) AS DOUBLE)
           AS dot
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label),
norms AS (
  SELECT label,
         SQRT(CAST(SUM(CAST(ROUND(c * c, 14) AS DECIMAL(28,14))) AS DOUBLE))
           AS nrm
  FROM cent GROUP BY label)
SELECT CAST(p.la AS INTEGER) AS label_a, CAST(p.lb AS INTEGER) AS label_b,
       ROUND(p.dot / (na.nrm * nb.nrm), 6) AS centroid_cosine
FROM prod p
JOIN norms na ON na.label = p.la
JOIN norms nb ON nb.label = p.lb
ORDER BY centroid_cosine DESC, label_a, label_b
LIMIT 5
"""

QUERIES["q_label_confusability"] = QuerySpec(
    q_label_confusability,
    Q_CONFUS_SQL,
    "top-5 most similar label-centroid pairs (cosine over k "
    "centroids) — the class-confusability audit",
)

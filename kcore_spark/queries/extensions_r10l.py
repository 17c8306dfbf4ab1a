"""Round-10 surface extensions, batch L (SURVEY §2.3 N r10): the
retrieval-evaluation block II — MRR (mean reciprocal rank of the
first same-label hit), the recall@k curve, and retrieval diversity /
catalog coverage of the top-10 lists. Together with q_ndcg_eval and
q_ann_recall these complete the standard offline retrieval-metric
suite over the pinned anchor set (vec_id % 97 == 0, the
q_knn_label_consistency convention).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: similarities rounded to 8 dp before ranking (ties then
broken by vec_id); per-anchor metrics are exact rationals surfaced
through decimal averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import as_double
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_TOP = 10

_RANKED_SQL = f"""
e AS (
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
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
              ORDER BY sim DESC, vec_id) AS rk
  FROM sims),
top AS (SELECT * FROM ranked WHERE rk <= {_TOP})
"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    ).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("e"), F.col("e"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
    )
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
    return sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= _TOP)


# ------------------------------------------- mean reciprocal rank
# Per anchor: 1/rank of the FIRST same-label item in the top-10
# (0 when none) — the navigational-retrieval headline metric.


def q_mrr_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = _ranked(spark, sf_dir)
    first = top.where(F.col("label") == F.col("a_label")).groupBy("a_id").agg(
        F.min("rk").alias("first_hit")
    )
    per = (
        top.select("a_id").distinct().join(first, "a_id", "left")
        .select(
            "a_id",
            F.coalesce(
                F.round(F.lit(1.0) / F.col("first_hit"), 8), F.lit(0.0)
            )
            .cast("decimal(18,8)")
            .alias("rr"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.sum((F.col("rr") > 0).cast("int")).cast("long").alias("n_with_hit"),
        F.round(F.avg("rr").cast("double"), 6).alias("mrr_at_10"),
    )


Q_MRR_SQL = f"""
WITH {_RANKED_SQL},
first AS (
  SELECT a_id, MIN(rk) AS first_hit
  FROM top WHERE label = a_label GROUP BY a_id),
per AS (
  SELECT t.a_id,
         CAST(COALESCE(ROUND(1.0 / f.first_hit, 8), 0.0) AS DECIMAL(18,8)) AS rr
  FROM (SELECT DISTINCT a_id FROM top) t
  LEFT JOIN first f ON f.a_id = t.a_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
       CAST(SUM(CASE WHEN rr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_hit,
       ROUND(CAST(AVG(rr) AS DOUBLE), 6) AS mrr_at_10
FROM per
"""

QUERIES["q_mrr_label"] = QuerySpec(
    q_mrr_label,
    Q_MRR_SQL,
    "MRR@10 of first same-label neighbor over the pinned anchor set "
    "— the navigational retrieval metric",
)


# ----------------------------------------------- recall@k curve
# Share of anchors with >= 1 same-label item in the top k, for
# k in {1, 5, 10} — 3-row grid over one ranked table.

_K_GRID = [1, 5, 10]


def q_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = _ranked(spark, sf_dir)
    grid = top.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _K_GRID])).alias("k")
    )
    hits = (
        F.broadcast(grid)
        .crossJoin(top)
        .where((F.col("rk") <= F.col("k")) & (F.col("label") == F.col("a_label")))
        .select("k", "a_id")
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_anchors = top.select("a_id").distinct().count()
    return (
        grid.join(hits, "k", "left")
        .na.fill({"n_hit": 0})
        .select(
            F.col("k").cast("int").alias("k"),
            F.lit(n_anchors).cast("long").alias("n_anchors"),
            F.col("n_hit").cast("long").alias("n_with_hit"),
            F.round(F.col("n_hit") / F.lit(float(n_anchors)), 6).alias("recall_at_k"),
        )
        .orderBy("k")
    )


Q_RECALL_SQL = f"""
WITH {_RANKED_SQL},
grid AS (SELECT UNNEST({_K_GRID!r}) AS k),
hits AS (
  SELECT g.k, COUNT(DISTINCT t.a_id) AS n_hit
  FROM grid g JOIN top t ON t.rk <= g.k AND t.label = t.a_label
  GROUP BY g.k),
na AS (SELECT COUNT(DISTINCT a_id) AS n FROM top)
SELECT CAST(g.k AS INTEGER) AS k,
       CAST(na.n AS BIGINT) AS n_anchors,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_with_hit,
       ROUND(COALESCE(h.n_hit, 0) / CAST(na.n AS DOUBLE), 6) AS recall_at_k
FROM grid g LEFT JOIN hits h ON h.k = g.k CROSS JOIN na
ORDER BY g.k
"""

QUERIES["q_recall_at_k"] = QuerySpec(
    q_recall_at_k,
    Q_RECALL_SQL,
    "recall@k curve (k in 1/5/10) of same-label hits over the pinned "
    "anchor set — the retrieval-coverage curve",
)


# ---------------------------- retrieval diversity + catalog coverage
# Per top-10 list: distinct labels (result diversity); globally: the
# share of the corpus ever retrieved (catalog coverage) — the two
# health metrics recommender audits pair with accuracy.


def q_retrieval_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = _ranked(spark, sf_dir)
    per = top.groupBy("a_id").agg(
        F.countDistinct("label").alias("n_labels")
    )
    corpus_n = load_table(spark, sf_dir, "embeddings").count()
    retrieved = top.select("vec_id").distinct().count()
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.round(
            F.avg(F.col("n_labels").cast("decimal(18,6)")).cast("double"), 6
        ).alias("avg_labels_per_list"),
        F.min("n_labels").cast("long").alias("min_labels"),
        F.max("n_labels").cast("long").alias("max_labels"),
    ).select(
        "*",
        F.lit(retrieved).cast("long").alias("n_distinct_retrieved"),
        F.round(F.lit(retrieved) / F.lit(float(corpus_n)), 6).alias(
            "catalog_coverage"
        ),
    )


Q_DIVERSITY_SQL = f"""
WITH {_RANKED_SQL},
per AS (
  SELECT a_id, COUNT(DISTINCT label) AS n_labels FROM top GROUP BY a_id),
cov AS (
  SELECT COUNT(DISTINCT vec_id) AS retrieved FROM top),
corpus AS (SELECT COUNT(*) AS n FROM embeddings)
SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
       ROUND(CAST(AVG(CAST(n_labels AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS avg_labels_per_list,
       CAST(MIN(n_labels) AS BIGINT) AS min_labels,
       CAST(MAX(n_labels) AS BIGINT) AS max_labels,
       CAST(ANY_VALUE(cov.retrieved) AS BIGINT) AS n_distinct_retrieved,
       ROUND(ANY_VALUE(cov.retrieved) / CAST(ANY_VALUE(corpus.n) AS DOUBLE), 6)
         AS catalog_coverage
FROM per, cov, corpus
"""

QUERIES["q_retrieval_diversity"] = QuerySpec(
    q_retrieval_diversity,
    Q_DIVERSITY_SQL,
    "top-10 list diversity (labels per list) + catalog coverage — "
    "the recommender-health pair",
)

"""Round-10 surface extensions, batch BN (SURVEY §2.3 N r10): the
retrieval-evaluation II block over two pinned scorers' top-20 lists
— rank-biased overlap (RBO, p = 0.9: the prefix-weighted list
similarity modern IR reports instead of plain Kendall), the ERR
metric (expected reciprocal rank with a graded cascade — the
position-bias-aware companion to q_ndcg_eval), and a retriever
overlap report (Jaccard@20 + exclusive counts). The two scorers
share a relevance lift plus independent md5 noise, so the lists
overlap partially — the realistic A/B-retriever setup.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: md5-pinned scores with total-order tiebreaks; RBO/ERR
run over ≤20-row lists (adjudicated bounded windows); geometric
weights are literal powers.
Scale: two distributed top-k selections; everything after is k-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_K = 20
_P = 0.9


def _ranked(spark: SparkSession, sf_dir: str, salt: str, rank_name: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / 4294967296.0
    )
    rel = (F.col("doc_id") % 7 == 0).cast("double")
    score = F.round(rel * 2.0 + u, 9)
    top = (
        docs.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_K)
    )
    return top.withColumn(
        rank_name,
        F.row_number().over(Window.orderBy(F.col("score").desc(), "doc_id")),
    ).select("doc_id", rank_name)


def _ranked_sql(salt: str, rank_name: str) -> str:
    return f"""
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS {rank_name}
  FROM (
    SELECT doc_id,
           ROUND(CASE WHEN doc_id % 7 = 0 THEN 2.0 ELSE 0.0 END
                 + ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8))::BIGINT
                   / 4294967296.0, 9) AS score
    FROM documents)
  ORDER BY score DESC, doc_id
  LIMIT {_K}
"""


# --------------------------------------------------------------- RBO
# RBO_min(p, k) = (1−p)/p · Σ_{d=1..k} p^d · X_d / d with X_d the
# overlap of the two depth-d prefixes; X_d = #{max(rA, rB) ≤ d}.


def q_rbo_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _ranked(spark, sf_dir, "ra", "ra")
    b = _ranked(spark, sf_dir, "rb", "rb")
    both = a.join(b, "doc_id").select(
        F.greatest(F.col("ra"), F.col("rb")).alias("m")
    )
    term = None
    for d in range(1, _K + 1):
        t = F.sum((F.col("m") <= d).cast("double")) * (_P**d / d)
        term = t if term is None else term + t
    agg = both.agg(
        F.count(F.lit(1)).cast("long").alias("overlap_k"),
        F.round((1.0 - _P) / _P * term, 6).alias("rbo"),
    )
    return agg


_RBO_TERMS = " + ".join(
    f"SUM(CASE WHEN m <= {d} THEN 1.0 ELSE 0.0 END) * {_P**d / d!r}"
    for d in range(1, _K + 1)
)

Q_RBO_SQL = f"""
WITH a AS ({_ranked_sql("ra", "ra")}),
b AS ({_ranked_sql("rb", "rb")}),
both_ AS (SELECT GREATEST(ra, rb) AS m FROM a JOIN b USING (doc_id))
SELECT CAST(COUNT(*) AS BIGINT) AS overlap_k,
       ROUND({(1.0 - _P) / _P!r} * ({_RBO_TERMS}), 6) AS rbo
FROM both_
"""

QUERIES["q_rbo_lists"] = QuerySpec(
    q_rbo_lists,
    Q_RBO_SQL,
    "rank-biased overlap (p=0.9, depth 20) between two pinned "
    "retriever lists — literal geometric weights",
)


# --------------------------------------------------------------- ERR
# Graded cascade over scorer A's list: g = 3 if doc_id%21=0 else
# 2 if doc_id%7=0 else 1 if doc_id%3=0 else 0; R = (2^g−1)/8.
# ERR = Σ_r (1/r)·R_r·Π_{j<r}(1−R_j), cumulative product via
# exp(Σ ln) with an exact-zero guard.


def q_err_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _ranked(spark, sf_dir, "ra", "r")
    g = (
        F.when(F.col("doc_id") % 21 == 0, 3)
        .when(F.col("doc_id") % 7 == 0, 2)
        .when(F.col("doc_id") % 3 == 0, 1)
        .otherwise(0)
    )
    rel = (F.pow(F.lit(2.0), g.cast("double")) - 1.0) / 8.0
    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, -1)
    scored = a.select("doc_id", "r", F.round(rel, 9).alias("rr"))
    walked = scored.withColumn(
        "log_miss",
        F.coalesce(
            F.sum(F.round(F.log(1.0 - F.col("rr")), 12)).over(w), F.lit(0.0)
        ),
    )
    term = F.col("rr") * F.exp(F.col("log_miss")) / F.col("r").cast("double")
    agg = walked.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.round(term, 12).cast("decimal(28,12)")).cast("double").alias("err"),
    )
    return agg.select("k", F.round("err", 6).alias("err"))


Q_ERR_SQL = f"""
WITH a AS ({_ranked_sql("ra", "r")}),
scored AS (
  SELECT doc_id, r,
         ROUND((POWER(2.0, CAST(CASE WHEN doc_id % 21 = 0 THEN 3
                                     WHEN doc_id % 7 = 0 THEN 2
                                     WHEN doc_id % 3 = 0 THEN 1
                                     ELSE 0 END AS DOUBLE)) - 1.0) / 8.0, 9) AS rr
  FROM a),
walked AS (
  SELECT r, rr,
         COALESCE(SUM(ROUND(LN(1.0 - rr), 12))
                  OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0.0) AS log_miss
  FROM scored)
SELECT CAST(COUNT(*) AS BIGINT) AS k,
       ROUND(CAST(SUM(CAST(ROUND(rr * EXP(log_miss) / CAST(r AS DOUBLE), 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 6) AS err
FROM walked
"""

QUERIES["q_err_metric"] = QuerySpec(
    q_err_metric,
    Q_ERR_SQL,
    "expected reciprocal rank with a graded cascade over the pinned "
    "top-20 — log-space cumulative miss product",
)


# ------------------------------------------------- retriever overlap


def q_retriever_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _ranked(spark, sf_dir, "ra", "ra")
    b = _ranked(spark, sf_dir, "rb", "rb")
    j = a.join(b, "doc_id", "full_outer")
    agg = j.agg(
        F.sum(
            (F.col("ra").isNotNull() & F.col("rb").isNotNull()).cast("long")
        ).alias("in_both"),
        F.sum(
            (F.col("ra").isNotNull() & F.col("rb").isNull()).cast("long")
        ).alias("only_a"),
        F.sum(
            (F.col("ra").isNull() & F.col("rb").isNotNull()).cast("long")
        ).alias("only_b"),
    )
    union = F.col("in_both") + F.col("only_a") + F.col("only_b")
    return agg.select(
        F.col("in_both").cast("long").alias("in_both"),
        F.col("only_a").cast("long").alias("only_a"),
        F.col("only_b").cast("long").alias("only_b"),
        F.round(F.col("in_both").cast("double") / union.cast("double"), 6).alias(
            "jaccard_at_k"
        ),
    )


Q_OVERLAP_SQL = f"""
WITH a AS ({_ranked_sql("ra", "ra")}),
b AS ({_ranked_sql("rb", "rb")}),
j AS (SELECT a.doc_id AS da, b.doc_id AS db, ra, rb
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS in_both,
       CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS only_a,
       CAST(SUM(CASE WHEN ra IS NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS only_b,
       ROUND(CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS jaccard_at_k
FROM j
"""

QUERIES["q_retriever_overlap"] = QuerySpec(
    q_retriever_overlap,
    Q_OVERLAP_SQL,
    "Jaccard@20 + exclusive counts between the two pinned retriever "
    "lists — one k-row full outer join",
)

"""Round-10 surface extensions, batch DP (SURVEY §2.3 N r10): the
dedup-threshold-science block — choosing a near-dup cosine threshold
WITH labels, over the 4-bit sign-blocked pair space (16 buckets; the
q_blocking_quality scheme). Threshold F1 (precision/recall/F1 of
"same label" at cosine >= 0.7/0.8/0.9 — the number that actually picks
a production threshold, where q_neardup_threshold_sweep only counts
pairs), split stability (fit the best threshold on an md5 half of the
pairs, check it wins on the other half — does the choice generalize?),
and similarity-bin precision (empirical P(same label) per cosine
quintile bin — the calibration curve behind the threshold). Recall is
measured within the blocked pair space (pinned, stated).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: cosines rounded to 6dp before every comparison; pair
counts exact; the half-split is md5-pinned on the (a,b) key.
Scale: pairs live inside sign-bit blocks (the LSH-band shape — never
all-pairs); per-threshold stats are count folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import cosine, with_norm
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_BITS = 4
_THRESH = [0.7, 0.8, 0.9]


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairs with rounded cosine and the same-label truth."""
    emb = load_table(spark, sf_dir, "embeddings")
    b = F.lit(0).cast("long")
    for i in range(_BITS):
        b = b + F.when(
            F.element_at(F.col("embedding"), i + 1) > 0, F.lit(1 << i)
        ).otherwise(0)
    base = with_norm(emb, "embedding", "vec_id")
    labeled = (
        emb.select("vec_id", "label")
        .join(base, emb.vec_id == base.id)
        .select("vec_id", "label", "e", "nrm")
    )
    blocked = emb.select(
        F.col("vec_id").alias("bid"), b.alias("blk")
    )
    lhs = labeled.join(blocked, labeled.vec_id == blocked.bid).select(
        F.col("vec_id").alias("a"),
        F.col("label").alias("la"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
        "blk",
    )
    rhs = labeled.join(blocked, labeled.vec_id == blocked.bid).select(
        F.col("vec_id").alias("bb"),
        F.col("label").alias("lb"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("blk").alias("blk2"),
    )
    return (
        lhs.join(rhs, (F.col("blk") == F.col("blk2")) & (F.col("a") < F.col("bb")))
        .select(
            "a",
            F.col("bb").alias("b"),
            F.round(
                cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")), 6
            ).alias("cos"),
            (F.col("la") == F.col("lb")).cast("long").alias("same"),
        )
    )


def _block_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_BITS)
    )
    return f"({terms})"


_PAIRS_SQL = f"""
  n AS (
    SELECT vec_id, label, {_block_sql()} AS blk,
           embedding::DOUBLE[] AS e,
           sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
    FROM embeddings),
  pairs AS (
    SELECT x.vec_id AS a, y.vec_id AS b,
           ROUND(list_inner_product(x.e, y.e) / (x.nrm * y.nrm), 6) AS cos,
           CASE WHEN x.label = y.label THEN 1 ELSE 0 END AS same
    FROM n x JOIN n y ON x.blk = y.blk AND x.vec_id < y.vec_id)
"""


def q_dedup_threshold_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = _pairs(spark, sf_dir)
    grid = F.explode(F.array(*[F.lit(t) for t in _THRESH])).alias("t")
    fan = pr.select("cos", "same", grid)
    agg = fan.groupBy("t").agg(
        F.sum(((F.col("cos") >= F.col("t")) & (F.col("same") == 1)).cast("long"))
        .alias("tp"),
        F.sum(((F.col("cos") >= F.col("t")) & (F.col("same") == 0)).cast("long"))
        .alias("fp"),
        F.sum(((F.col("cos") < F.col("t")) & (F.col("same") == 1)).cast("long"))
        .alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"),
    ).otherwise(0.0)
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"),
    ).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2.0 * prec * rec / (prec + rec)).otherwise(0.0)
    return agg.select(
        F.col("t").alias("threshold"),
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall_in_block"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("threshold")


Q_F1_SQL = f"""
WITH {_PAIRS_SQL},
fan AS (
  SELECT cos, same, t
  FROM pairs CROSS JOIN
    (SELECT UNNEST([{", ".join(str(t) for t in _THRESH)}]::DOUBLE[]) AS t) g),
agg AS (
  SELECT t,
         CAST(SUM(CASE WHEN cos >= t AND same = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN cos >= t AND same = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN cos < t AND same = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
  FROM fan GROUP BY t)
SELECT t AS threshold, tp, fp, fn,
       ROUND(CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE)
             ELSE 0.0 END, 6) AS precision,
       ROUND(CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE)
             ELSE 0.0 END, 6) AS recall_in_block,
       ROUND(CASE WHEN (CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE)
                        ELSE 0.0 END)
                  + (CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE)
                     ELSE 0.0 END) > 0
             THEN 2.0 * (CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE)
                         ELSE 0.0 END)
                      * (CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE)
                         ELSE 0.0 END)
                  / ((CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE)
                      ELSE 0.0 END)
                     + (CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE)
                        ELSE 0.0 END))
             ELSE 0.0 END, 6) AS f1
FROM agg ORDER BY threshold
"""

QUERIES["q_dedup_threshold_f1"] = QuerySpec(
    q_dedup_threshold_f1,
    Q_F1_SQL,
    "near-dup threshold P/R/F1 against label truth at 0.7/0.8/0.9 — "
    "sign-blocked pair space, count folds",
)


def q_threshold_split_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-F1 threshold chosen on each md5 half of the pairs; do the
    halves agree?"""
    pr = _pairs(spark, sf_dir).withColumn(
        "half",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("a").cast("string"),
                            F.lit("|"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            % 2
        ).cast("int"),
    )
    grid = F.explode(F.array(*[F.lit(t) for t in _THRESH])).alias("t")
    fan = pr.select("half", "cos", "same", grid)
    agg = fan.groupBy("half", "t").agg(
        F.sum(((F.col("cos") >= F.col("t")) & (F.col("same") == 1)).cast("long"))
        .alias("tp"),
        F.sum(((F.col("cos") >= F.col("t")) & (F.col("same") == 0)).cast("long"))
        .alias("fp"),
        F.sum(((F.col("cos") < F.col("t")) & (F.col("same") == 1)).cast("long"))
        .alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"),
    ).otherwise(0.0)
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"),
    ).otherwise(0.0)
    f1 = F.round(
        F.when(prec + rec > 0, 2.0 * prec * rec / (prec + rec)).otherwise(0.0), 6
    )
    scored = agg.select("half", "t", f1.alias("f1"))
    best = scored.groupBy("half").agg(
        F.max(F.struct(F.col("f1"), (-F.col("t")).alias("nt")))["nt"].alias("nt")
    ).select("half", (-F.col("nt")).alias("best_t"))
    a = best.where(F.col("half") == 0).select(F.col("best_t").alias("t_half0"))
    bb = best.where(F.col("half") == 1).select(F.col("best_t").alias("t_half1"))
    return a.crossJoin(F.broadcast(bb)).select(
        "t_half0",
        "t_half1",
        (F.col("t_half0") == F.col("t_half1")).alias("choice_stable"),
    )


Q_STAB_SQL = f"""
WITH {_PAIRS_SQL},
halved AS (
  SELECT cos, same,
         CAST(('0x' || substring(md5(CAST(a AS VARCHAR) || '|'
                || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2 AS INT) AS half
  FROM pairs),
fan AS (
  SELECT half, cos, same, t
  FROM halved CROSS JOIN
    (SELECT UNNEST([{", ".join(str(t) for t in _THRESH)}]::DOUBLE[]) AS t) g),
agg AS (
  SELECT half, t,
         SUM(CASE WHEN cos >= t AND same = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN cos >= t AND same = 0 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN cos < t AND same = 1 THEN 1 ELSE 0 END) AS fn
  FROM fan GROUP BY 1, 2),
scored AS (
  SELECT half, t,
         ROUND(CASE WHEN tp > 0 THEN
                 2.0 * (tp / CAST(tp + fp AS DOUBLE))
                     * (tp / CAST(tp + fn AS DOUBLE))
                 / ((tp / CAST(tp + fp AS DOUBLE))
                    + (tp / CAST(tp + fn AS DOUBLE)))
               ELSE 0.0 END, 6) AS f1
  FROM agg),
best AS (
  SELECT half, t AS best_t FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY half
                             ORDER BY f1 DESC, t ASC) = 1)
SELECT h0.best_t AS t_half0, h1.best_t AS t_half1,
       h0.best_t = h1.best_t AS choice_stable
FROM (SELECT best_t FROM best WHERE half = 0) h0
CROSS JOIN (SELECT best_t FROM best WHERE half = 1) h1
"""

QUERIES["q_threshold_split_stability"] = QuerySpec(
    q_threshold_split_stability,
    Q_STAB_SQL,
    "best-F1 threshold fitted on each md5 half of the pair space — "
    "does the choice generalize across halves?",
)


def q_similarity_bin_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical P(same label) per cosine bin — the calibration curve
    of the similarity score (fixed-width bins over [-1, 1])."""
    pr = _pairs(spark, sf_dir)
    binned = pr.select(
        F.least(
            F.lit(4),
            F.floor((F.col("cos") + 1.0) / 0.4).cast("int"),
        ).alias("bin"),
        "same",
    )
    tot = pr.count()
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("same").cast("long").alias("n_same"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * 0.4 - 1.0, 1).alias("cos_lo"),
            "n_pairs",
            "n_same",
            F.round(F.col("n_same") / F.col("n_pairs").cast("double"), 6).alias(
                "p_same_label"
            ),
            F.round(F.col("n_pairs") / F.lit(float(tot)), 6).alias("pair_share"),
        )
        .orderBy("bin")
    )


Q_BIN_SQL = f"""
WITH {_PAIRS_SQL},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pairs),
binned AS (
  SELECT LEAST(4, CAST(FLOOR((cos + 1.0) / 0.4) AS INT)) AS bin, same
  FROM pairs)
SELECT bin,
       ROUND(bin * 0.4 - 1.0, 1) AS cos_lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(same) AS BIGINT) AS n_same,
       ROUND(SUM(same) / CAST(COUNT(*) AS DOUBLE), 6) AS p_same_label,
       ROUND(COUNT(*) / CAST(MIN(t) AS DOUBLE), 6) AS pair_share
FROM binned CROSS JOIN tot GROUP BY bin ORDER BY bin
"""

QUERIES["q_similarity_bin_precision"] = QuerySpec(
    q_similarity_bin_precision,
    Q_BIN_SQL,
    "P(same label) per cosine bin over the blocked pair space — the "
    "similarity-score calibration curve",
)

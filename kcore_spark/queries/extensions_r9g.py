"""Round-9 surface extensions, batch G (SURVEY §2.3 N r9): the
model-evaluation and nonparametric-statistics corners that were still
open — a full multi-class classification report (per-class
precision/recall/F1 + macro/micro rows), PR-curve average precision
(the imbalanced-data complement to q_auc_roc), the Kruskal-Wallis
k-sample rank test (extends q_mann_whitney beyond two groups), and
Spearman rank correlation (the robust complement to the Pearson-based
q_ols_slope).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: every "random" quantity is the
md5-uniform (q_hash_sample idiom) and every rank statistic stays in
the integer domain (2·avg-rank = 2·below + cnt + 1) until one final
division, so both engines agree bit-for-bit before the explicit
ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------- multi-class classification report
# The standard per-class P/R/F1/support table plus macro and micro
# rows. The "model" is a pinned deterministic corruptor: 80% of docs
# keep their true lang, 20% are predicted as the NEXT lang in the
# alphabetically-sorted lang ring (derived from the data, so the
# query is fixture-regeneration-proof). Scale shape: the lang
# dimension is tiny (broadcast ring join); the confusion matrix is a
# |classes|² partial-agg groupBy riding the scan — at 100 TB the
# shuffle moves |classes|² rows, not data.


def q_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    langs = (
        docs.select("lang")
        .distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("lang")) - 1)
    )
    k = langs.withColumnRenamed("lang", "nxt_lang").withColumnRenamed("idx", "nidx")
    n_cls = langs.groupBy().agg(F.count(F.lit(1)).alias("k"))
    ring = (
        langs.crossJoin(F.broadcast(n_cls))
        .join(
            F.broadcast(k),
            F.col("nidx") == (F.col("idx") + 1) % F.col("k"),
        )
        .select("lang", "nxt_lang")
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    pred = docs.join(F.broadcast(ring), "lang").select(
        F.col("lang").alias("actual"),
        F.when(u % 5 < 4, F.col("lang")).otherwise(F.col("nxt_lang")).alias("pred"),
    )
    conf = pred.groupBy("actual", "pred").agg(F.count(F.lit(1)).alias("n"))
    per_class = (
        conf.groupBy(F.col("actual").alias("cls"))
        .agg(
            F.sum("n").alias("support"),
            F.sum(F.when(F.col("pred") == F.col("actual"), F.col("n")).otherwise(0)).alias("tp"),
        )
        .join(
            conf.groupBy(F.col("pred").alias("cls")).agg(
                F.sum("n").alias("pred_n")
            ),
            "cls",
            "full",
        )
        .na.fill({"support": 0, "tp": 0, "pred_n": 0})
    )
    cls_rows = per_class.select(
        F.col("cls"),
        F.col("support").cast("long").alias("support"),
        F.round(F.col("tp") / F.greatest(F.col("pred_n"), F.lit(1)), 6).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("support"), F.lit(1)), 6).alias("recall"),
        F.round(
            2.0 * F.col("tp") / F.greatest(F.col("pred_n") + F.col("support"), F.lit(1)),
            6,
        ).alias("f1"),
    )
    # macro = unweighted mean of per-class metrics; micro = global
    # tp / total (same for P, R and F1 in single-label classification)
    macro = per_class.agg(
        F.lit("__macro__").alias("cls"),
        F.sum("support").cast("long").alias("support"),
        F.round(F.avg(F.col("tp") / F.greatest(F.col("pred_n"), F.lit(1))), 6).alias("precision"),
        F.round(F.avg(F.col("tp") / F.greatest(F.col("support"), F.lit(1))), 6).alias("recall"),
        F.round(
            F.avg(2.0 * F.col("tp") / F.greatest(F.col("pred_n") + F.col("support"), F.lit(1))),
            6,
        ).alias("f1"),
    )
    micro = per_class.agg(
        F.lit("__micro__").alias("cls"),
        F.sum("support").cast("long").alias("support"),
        F.round(F.sum("tp") / F.sum("support"), 6).alias("precision"),
        F.round(F.sum("tp") / F.sum("support"), 6).alias("recall"),
        F.round(F.sum("tp") / F.sum("support"), 6).alias("f1"),
    )
    return cls_rows.unionByName(macro).unionByName(micro).orderBy("cls")


Q_CLS_REPORT_SQL = """
WITH langs AS (
  SELECT lang, ROW_NUMBER() OVER (ORDER BY lang) - 1 AS idx
  FROM (SELECT DISTINCT lang FROM documents)),
ring AS (
  SELECT a.lang, b.lang AS nxt_lang
  FROM langs a JOIN langs b
    ON b.idx = (a.idx + 1) % (SELECT COUNT(*) FROM langs)),
pred AS (
  SELECT d.lang AS actual,
         CASE WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 < 4
              THEN d.lang ELSE r.nxt_lang END AS pred
  FROM documents d JOIN ring r ON d.lang = r.lang),
conf AS (SELECT actual, pred, COUNT(*) AS n FROM pred GROUP BY 1, 2),
per_class AS (
  SELECT COALESCE(a.cls, p.cls) AS cls,
         COALESCE(a.support, 0) AS support, COALESCE(a.tp, 0) AS tp,
         COALESCE(p.pred_n, 0) AS pred_n
  FROM (SELECT actual AS cls, SUM(n) AS support,
               SUM(CASE WHEN pred = actual THEN n ELSE 0 END) AS tp
        FROM conf GROUP BY 1) a
  FULL JOIN (SELECT pred AS cls, SUM(n) AS pred_n FROM conf GROUP BY 1) p
    ON a.cls = p.cls)
SELECT cls, CAST(support AS BIGINT) AS support,
       ROUND(tp / GREATEST(pred_n, 1), 6) AS precision,
       ROUND(tp / GREATEST(support, 1), 6) AS recall,
       ROUND(2.0 * tp / GREATEST(pred_n + support, 1), 6) AS f1
FROM per_class
UNION ALL
SELECT '__macro__', CAST(SUM(support) AS BIGINT),
       ROUND(AVG(tp / GREATEST(pred_n, 1)), 6),
       ROUND(AVG(tp / GREATEST(support, 1)), 6),
       ROUND(AVG(2.0 * tp / GREATEST(pred_n + support, 1)), 6)
FROM per_class
UNION ALL
SELECT '__micro__', CAST(SUM(support) AS BIGINT),
       ROUND(SUM(tp) / SUM(support), 6), ROUND(SUM(tp) / SUM(support), 6),
       ROUND(SUM(tp) / SUM(support), 6)
FROM per_class
ORDER BY cls
"""

QUERIES["q_classification_report"] = QuerySpec(
    q_classification_report,
    Q_CLS_REPORT_SQL,
    "multi-class classification report: per-class precision/recall/F1/"
    "support plus macro and micro rows, confusion from a pinned "
    "deterministic lang-ring corruptor",
)


# ------------------------------- PR-curve average precision (PR AUC)
# AP = (1/n_pos) Σ_{i: positive} precision@i over the ranking by
# score DESC — the standard step-interpolated average precision that
# sklearn reports. Complements q_auc_roc: ROC AUC is rank-symmetric,
# AP weights the head, which is what retrieval/imbalanced tasks need.
# Determinism: the score embeds vec_id so the ranking is total (no
# ties to make AP ambiguous); the rank itself comes from the same
# by-score reduced table as q_auc_roc.


def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # pinned scorer: md5-uniform plus a label-dependent lift so the
    # curve is informative (AP ≈ 0.75, not prevalence); vec_id in the
    # hash makes all scores distinct — a total order, unambiguous AP
    h = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    scored = emb.select(
        (h + F.when(F.col("label") >= 5, 0.7).otherwise(0.0)).alias("s"),
        (F.col("label") >= 5).cast("int").alias("pos"),
    )
    # Scores are all-distinct by construction, so this table is
    # ROW-count-sized — the r12 bounded-domain probe turned the old
    # "acceptable at fixture scale" single-partition window into the
    # fused distributed rank+prefix-sum (_dist_rank_cumsum: one
    # range-repartition on descending score, per-partition windows in
    # parallel, a ≤32-row count+sum offset broadcast). Descending
    # order is expressed by ranking on the negated score (ties
    # impossible, so the order is total either way).
    from kcore_spark.queries.extensions_r8 import _dist_rank_cumsum

    ranked = _dist_rank_cumsum(
        scored.withColumn("ns", -F.col("s")),
        [F.col("ns")],
        "pos",
        rk_col="i",
        cum_col="cum_pos",
    ).select("pos", "i", "cum_pos")
    return ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.when(F.col("pos") == 1, F.col("cum_pos") / F.col("i")).otherwise(0.0))
            / F.sum("pos"),
            6,
        ).alias("avg_precision"),
    )


Q_PR_AUC_SQL = """
WITH scored AS (
  SELECT (('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0
          + CASE WHEN label >= 5 THEN 0.7 ELSE 0.0 END) AS s,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings),
ranked AS (
  SELECT pos, ROW_NUMBER() OVER (ORDER BY s DESC) AS i,
         SUM(pos) OVER (ORDER BY s DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
  FROM scored)
SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(CASE WHEN pos = 1 THEN cum_pos * 1.0 / i ELSE 0.0 END)
             / SUM(pos), 6) AS avg_precision
FROM ranked
"""

QUERIES["q_pr_auc"] = QuerySpec(
    q_pr_auc,
    Q_PR_AUC_SQL,
    "PR-curve average precision (step AP) of a pinned total-order "
    "scorer — the imbalanced-data complement to q_auc_roc",
)


# ------------------------------------ Kruskal-Wallis k-sample test
# H = 12/(N(N+1)) Σ_j R_j²/n_j − 3(N+1), tie-corrected by
# C = 1 − Σ(t³−t)/(N³−N). Extends q_mann_whitney to k groups (order
# priorities) — "does order value differ by priority?". Integer
# domain: per distinct value, 2·avg-rank = 2·below + cnt + 1; the
# per-group double rank sum 2R_j is an exact integer, so the only
# float steps are the two final formula evaluations.
# Scale: the ONLY globally-ordered object is the distinct-value tie
# table (bounded by value cardinality, not row count); per-group rank
# sums are a partial-agg shuffle of k rows.


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("v"),
    )
    # distinct o_totalprice is order-count-sized (measured 149,743 at
    # sf0.1, 10.0x per 10x data — r12 bounded-domain probe), so the
    # rank walk runs on _dist_cumsum, not a global window (below =
    # inclusive prefix − own count)
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    by_val = orders.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    with_below = _dist_cumsum(by_val, [F.col("v")], "cnt", out_col="cum").withColumn(
        "below", F.col("cum") - F.col("cnt")
    )
    # 2·avg-rank per distinct value, joined back to group membership
    ranked = orders.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("gcnt")).join(
        with_below, "v"
    )
    per_grp = ranked.groupBy("grp").agg(
        F.sum("gcnt").alias("n_j"),
        F.sum(F.col("gcnt") * (2 * F.col("below") + F.col("cnt") + 1)).alias("two_r_j"),
    )
    ties = by_val.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias("tie3"),
    )
    return (
        per_grp.crossJoin(F.broadcast(ties))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_groups"),
            F.max("n").cast("long").alias("n"),
            F.round(
                12.0
                / (F.max("n") * (F.max("n") + 1))
                * F.sum(
                    (F.col("two_r_j") / 2.0) * (F.col("two_r_j") / 2.0) / F.col("n_j")
                )
                - 3.0 * (F.max("n") + 1),
                6,
            ).alias("h_stat"),
            F.round(
                (
                    12.0
                    / (F.max("n") * (F.max("n") + 1))
                    * F.sum(
                        (F.col("two_r_j") / 2.0)
                        * (F.col("two_r_j") / 2.0)
                        / F.col("n_j")
                    )
                    - 3.0 * (F.max("n") + 1)
                )
                / F.nullif(
                    1.0
                    - F.max("tie3")
                    / (
                        F.max("n").cast("double")
                        * F.max("n")
                        * F.max("n")
                        - F.max("n")
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("h_tie_corrected"),
        )
    )


Q_KRUSKAL_SQL = """
WITH src AS (SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders),
by_val AS (SELECT v, COUNT(*) AS cnt FROM src GROUP BY v),
with_below AS (
  SELECT *, COALESCE(SUM(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM by_val),
ranked AS (
  SELECT g.grp, g.gcnt, b.cnt, b.below
  FROM (SELECT grp, v, COUNT(*) AS gcnt FROM src GROUP BY grp, v) g
  JOIN with_below b USING (v)),
per_grp AS (
  SELECT grp, SUM(gcnt) AS n_j,
         SUM(gcnt * (2 * below + cnt + 1)) AS two_r_j
  FROM ranked GROUP BY grp),
ties AS (
  SELECT SUM(cnt) AS n, SUM(cnt * cnt * cnt - cnt) AS tie3 FROM by_val)
SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
       CAST(MAX(n) AS BIGINT) AS n,
       ROUND(12.0 / (MAX(n) * (MAX(n) + 1))
             * SUM((two_r_j / 2.0) * (two_r_j / 2.0) / n_j)
             - 3.0 * (MAX(n) + 1), 6) AS h_stat,
       ROUND((12.0 / (MAX(n) * (MAX(n) + 1))
              * SUM((two_r_j / 2.0) * (two_r_j / 2.0) / n_j)
              - 3.0 * (MAX(n) + 1))
             / NULLIF(1.0 - MAX(tie3)
                / (CAST(MAX(n) AS DOUBLE) * MAX(n) * MAX(n) - MAX(n)), 0.0), 6)
         AS h_tie_corrected
FROM per_grp CROSS JOIN ties
"""

QUERIES["q_kruskal_wallis"] = QuerySpec(
    q_kruskal_wallis,
    Q_KRUSKAL_SQL,
    "Kruskal-Wallis k-sample rank test (tie-corrected H) of order "
    "value across priorities — integer-domain tie-averaged ranks",
)


# ------------------------------------ Spearman rank correlation
# ρ = Pearson over tie-averaged mid-ranks. Robust complement to the
# parametric q_ols_slope / q_welch_ttest family. Numerically: ranks
# are CENTERED ((2r − N − 1)/2, magnitude ≤ N) before the moment
# sums, so the final ratio has no catastrophic cancellation even at
# 10⁹ rows where Σr² ~ N³ would eat all double precision.
# Scale: two distinct-value tie tables (bounded by value cardinality),
# one join back per axis, one 1-row reduction.


def _midrank2(df: DataFrame, col: str) -> DataFrame:
    """Per distinct value of ``col``: 2·avg-rank (exact integer).

    Computed on the distributed prefix-sum machinery (_dist_cumsum:
    range-repartition + per-partition running sums + a ≤32-row offset
    broadcast), NOT a global Window.orderBy — the r12 bounded-domain
    probe (scripts/probe_bounded_domains.py) measured this tie table
    at 97% of the row count for l_extendedprice (583k distinct at
    sf0.1, ratio 9.7x per 10x data): it is row-count-sized, so the
    old single-partition window was the exact break SCALE.md's
    re-check table warns about. two_rank = 2·cum_inclusive − cnt + 1
    ≡ 2·below + cnt + 1, bit-identical to the window form."""
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    by_val = df.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    return _dist_cumsum(by_val, [F.col("v")], "cnt", out_col="cum").select(
        "v", (2 * F.col("cum") - F.col("cnt") + 1).alias("two_rank")
    )


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: REVERTED to the r12 shape. The r13 spread(y)+persist was
    # driver-contradicted (PERF_r13: 3.10 -> 4.01 s) and a 6-rep
    # interleaved equal-load A/B this round confirmed it: r12 4.22 s
    # vs r13 4.66 s min-of-6 — the cache materialization costs more
    # than re-deriving the projected 2-column scan 4x, and the y-keyed
    # exchange reuse never paid for the extra write. Recorded so a
    # future round doesn't re-try the spread here.
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    rx = _midrank2(li, "x").withColumnRenamed("two_rank", "trx")
    ry = _midrank2(li, "y").withColumnRenamed("two_rank", "try_")
    j = (
        li.join(rx.withColumnRenamed("v", "x"), "x")
        .join(ry.withColumnRenamed("v", "y"), "y")
    )
    n = li.count()
    # centered mid-rank: r − (N+1)/2 = (two_rank − N − 1)/2
    cx = (F.col("trx") - F.lit(n + 1)) / 2.0
    cy = (F.col("try_") - F.lit(n + 1)) / 2.0
    return j.agg(
        F.lit(n).cast("long").alias("n"),
        F.round(
            F.sum(cx * cy)
            / F.nullif(F.sqrt(F.sum(cx * cx) * F.sum(cy * cy)), F.lit(0.0)),
            6,
        ).alias("spearman_rho"),
    )


Q_SPEARMAN_SQL = """
WITH src AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
n_all AS (SELECT COUNT(*) AS n FROM src),
rx AS (
  SELECT v AS x, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS trx
  FROM (SELECT x AS v, COUNT(*) AS cnt FROM src GROUP BY x)),
ry AS (
  SELECT v AS y, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS try_
  FROM (SELECT y AS v, COUNT(*) AS cnt FROM src GROUP BY y))
SELECT CAST(MAX(n) AS BIGINT) AS n,
       ROUND(SUM(((trx - n - 1) / 2.0) * ((try_ - n - 1) / 2.0))
             / NULLIF(SQRT(SUM(((trx - n - 1) / 2.0) * ((trx - n - 1) / 2.0))
                    * SUM(((try_ - n - 1) / 2.0) * ((try_ - n - 1) / 2.0))), 0.0), 6)
         AS spearman_rho
FROM src JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN n_all
"""

QUERIES["q_spearman_corr"] = QuerySpec(
    q_spearman_corr,
    Q_SPEARMAN_SQL,
    "Spearman rank correlation (tie-averaged mid-ranks, centered "
    "before the moment sums) of quantity vs extended price",
)

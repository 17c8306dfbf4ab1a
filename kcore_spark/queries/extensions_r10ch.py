"""Round-10 surface extensions, batch CH (SURVEY §2.3 N r10): the
rank-fusion block, second wave — Borda-count fusion (positional points
over three supplier criterion shortlists: the multi-criteria vendor
scorecard), Condorcet/Copeland fusion (pairwise-majority over the same
lists — robust to one outlier ranker where Borda is not), and bpref
(retrieval quality under incomplete judgments — the metric that stays
stable when unjudged documents flood the pool, next to q_ndcg_eval /
q_pr_auc / q_err_metric). Shortlists follow the q_rrf_fusion shape:
top-20 TakeOrdered lists, so every fusion window/join is k-row.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: criterion scores are decimal sums; every shortlist is
fully tie-broken by key; missing-from-list ranks are pinned at K+1;
bpref judgments come from the embedding labels (exact integers).
Scale: corpus cost is the criterion scans; fusion is k-row algebra
(the q_rrf_fusion adjudication).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_K = 20
_TOP = 10
_QV = 7  # bpref query vector


def _criterion_lists(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.col("l_quantity"),
    )
    per = li.groupBy("l_suppkey").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("revenue"),
        F.countDistinct("l_orderkey").cast("long").alias("breadth"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("volume"),
    )
    out = {}
    for crit in ("revenue", "breadth", "volume"):
        w = Window.orderBy(F.col(crit).desc(), F.col("l_suppkey"))
        out[crit] = (
            per.orderBy(F.col(crit).desc(), "l_suppkey")
            .limit(_K)
            .withColumn(f"rank_{crit}", F.row_number().over(w))
            .select("l_suppkey", f"rank_{crit}")
        )
    return out


_PER_SQL = """
  per AS (
    SELECT l_suppkey,
           SUM(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    AS DECIMAL(38,0))) AS revenue,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS breadth,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS volume
    FROM lineitem GROUP BY l_suppkey)
"""


def _list_sql(crit: str) -> str:
    return f"""
  {crit}_l AS (
    SELECT l_suppkey, ROW_NUMBER() OVER (ORDER BY {crit} DESC, l_suppkey)
               AS rank_{crit}
    FROM (SELECT l_suppkey, {crit} FROM per
          ORDER BY {crit} DESC, l_suppkey LIMIT {_K}))
"""


def _fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    ls = _criterion_lists(spark, sf_dir)
    f = (
        ls["revenue"]
        .join(ls["breadth"], "l_suppkey", "full_outer")
        .join(ls["volume"], "l_suppkey", "full_outer")
    )
    return f.select(
        "l_suppkey",
        *[
            F.coalesce(F.col(f"rank_{c}"), F.lit(_K + 1)).alias(f"r_{c}")
            for c in ("revenue", "breadth", "volume")
        ],
    )


_FUSED_SQL = f"""
  fused AS (
    SELECT COALESCE(revenue_l.l_suppkey, breadth_l.l_suppkey,
                    volume_l.l_suppkey) AS l_suppkey,
           COALESCE(rank_revenue, {_K + 1}) AS r_revenue,
           COALESCE(rank_breadth, {_K + 1}) AS r_breadth,
           COALESCE(rank_volume, {_K + 1}) AS r_volume
    FROM revenue_l
    FULL OUTER JOIN breadth_l ON revenue_l.l_suppkey = breadth_l.l_suppkey
    FULL OUTER JOIN volume_l
      ON COALESCE(revenue_l.l_suppkey, breadth_l.l_suppkey)
         = volume_l.l_suppkey)
"""


def q_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    fused = _fused(spark, sf_dir)
    pts = sum(
        F.greatest(F.lit(_K + 1) - F.col(f"r_{c}"), F.lit(0))
        for c in ("revenue", "breadth", "volume")
    )
    return (
        fused.select(
            "l_suppkey",
            "r_revenue",
            "r_breadth",
            "r_volume",
            pts.cast("long").alias("borda_points"),
        )
        .orderBy(F.col("borda_points").desc(), "l_suppkey")
        .limit(_TOP)
    )


Q_BORDA_SQL = f"""
WITH {_PER_SQL},
{_list_sql("revenue")},
{_list_sql("breadth")},
{_list_sql("volume")},
{_FUSED_SQL}
SELECT l_suppkey, r_revenue, r_breadth, r_volume,
       CAST(GREATEST({_K + 1} - r_revenue, 0)
            + GREATEST({_K + 1} - r_breadth, 0)
            + GREATEST({_K + 1} - r_volume, 0) AS BIGINT) AS borda_points
FROM fused
ORDER BY borda_points DESC, l_suppkey
LIMIT {_TOP}
"""

QUERIES["q_borda_fusion"] = QuerySpec(
    q_borda_fusion,
    Q_BORDA_SQL,
    "Borda-count fusion of three supplier criterion top-20 lists — "
    "k-row positional points, fully tie-broken",
)


def q_condorcet_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    fused = _fused(spark, sf_dir)
    a = fused.select(
        F.col("l_suppkey").alias("sa"),
        F.col("r_revenue").alias("a1"),
        F.col("r_breadth").alias("a2"),
        F.col("r_volume").alias("a3"),
    )
    b = fused.select(
        F.col("l_suppkey").alias("sb"),
        F.col("r_revenue").alias("b1"),
        F.col("r_breadth").alias("b2"),
        F.col("r_volume").alias("b3"),
    )
    wins = (
        (F.col("a1") < F.col("b1")).cast("int")
        + (F.col("a2") < F.col("b2")).cast("int")
        + (F.col("a3") < F.col("b3")).cast("int")
    )
    pairs = a.crossJoin(F.broadcast(b)).where(F.col("sa") != F.col("sb")).select(
        "sa", (wins >= 2).cast("long").alias("beats")
    )
    return (
        pairs.groupBy(F.col("sa").alias("l_suppkey"))
        .agg(F.sum("beats").cast("long").alias("copeland"))
        .orderBy(F.col("copeland").desc(), "l_suppkey")
        .limit(_TOP)
    )


Q_CONDORCET_SQL = f"""
WITH {_PER_SQL},
{_list_sql("revenue")},
{_list_sql("breadth")},
{_list_sql("volume")},
{_FUSED_SQL}
SELECT a.l_suppkey AS l_suppkey,
       CAST(SUM(CASE WHEN
              (CASE WHEN a.r_revenue < b.r_revenue THEN 1 ELSE 0 END
               + CASE WHEN a.r_breadth < b.r_breadth THEN 1 ELSE 0 END
               + CASE WHEN a.r_volume < b.r_volume THEN 1 ELSE 0 END) >= 2
            THEN 1 ELSE 0 END) AS BIGINT) AS copeland
FROM fused a, fused b
WHERE a.l_suppkey <> b.l_suppkey
GROUP BY a.l_suppkey
ORDER BY copeland DESC, l_suppkey
LIMIT {_TOP}
"""

QUERIES["q_condorcet_fusion"] = QuerySpec(
    q_condorcet_fusion,
    Q_CONDORCET_SQL,
    "Condorcet/Copeland fusion over the same three shortlists — "
    "pairwise majority on the k-row union",
)


# ---------------------------------------------------------------- bpref
# Dense cosine top-20 for query vec 7; relevant = same label.
# bpref = (1/R) sum_{rel r} (1 - min(nonrel_above_r, R) / min(R, N)).


def q_bpref(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.similarity import cosine, with_norm

    norms = with_norm(load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id")
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    qv = norms.where(F.col("id") == _QV).select(
        F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    qlab = labels.where(F.col("vec_id") == _QV).select(
        F.col("label").alias("qlabel")
    )
    shortlist = (
        norms.where(F.col("id") != _QV)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("id").alias("vec_id"),
            F.round(
                cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")), 6
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(_K)
    )
    judged = (
        shortlist.join(labels, "vec_id")
        .crossJoin(F.broadcast(qlab))
        .select(
            "vec_id",
            "sim",
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("vec_id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = judged.withColumn(
        "nonrel_above", F.coalesce(F.sum(1 - F.col("rel")).over(w), F.lit(0))
    )
    tot = ranked.agg(
        F.sum("rel").cast("long").alias("r_tot"),
        F.sum(1 - F.col("rel")).cast("long").alias("n_tot"),
    )
    terms = ranked.where(F.col("rel") == 1).crossJoin(F.broadcast(tot)).select(
        "r_tot",
        "n_tot",
        F.round(
            1.0
            - F.least(F.col("nonrel_above"), F.col("r_tot")).cast("double")
            / F.least(F.col("r_tot"), F.col("n_tot")).cast("double"),
            12,
        )
        .cast("decimal(38,12)")
        .alias("t"),
    )
    return terms.groupBy("r_tot", "n_tot").agg(
        F.round(
            F.sum("t").cast("double") / F.col("r_tot").cast("double"), 6
        ).alias("bpref")
    ).select(
        F.col("r_tot").alias("n_relevant"),
        F.col("n_tot").alias("n_nonrelevant"),
        "bpref",
    )


Q_BPREF_SQL = f"""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             AS nrm
  FROM embeddings),
q AS (SELECT e AS qe, nrm AS qn FROM n WHERE vec_id = {_QV}),
qlab AS (SELECT label AS qlabel FROM embeddings WHERE vec_id = {_QV}),
shortlist AS (
  SELECT vec_id, ROUND(list_inner_product(n.e, qe) / (n.nrm * qn), 6) AS sim
  FROM n CROSS JOIN q WHERE vec_id <> {_QV}
  ORDER BY sim DESC, vec_id LIMIT {_K}),
judged AS (
  SELECT s.vec_id, sim,
         CASE WHEN e.label = qlabel THEN 1 ELSE 0 END AS rel
  FROM shortlist s
  JOIN embeddings e ON s.vec_id = e.vec_id
  CROSS JOIN qlab),
ranked AS (
  SELECT vec_id, sim, rel,
         COALESCE(SUM(1 - rel) OVER (ORDER BY sim DESC, vec_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nonrel_above
  FROM judged),
tot AS (
  SELECT CAST(SUM(rel) AS BIGINT) AS r_tot,
         CAST(SUM(1 - rel) AS BIGINT) AS n_tot
  FROM ranked),
terms AS (
  SELECT r_tot, n_tot,
         CAST(ROUND(1.0 - CAST(LEAST(nonrel_above, r_tot) AS DOUBLE)
                          / CAST(LEAST(r_tot, n_tot) AS DOUBLE), 12)
              AS DECIMAL(38,12)) AS t
  FROM ranked CROSS JOIN tot WHERE rel = 1)
SELECT r_tot AS n_relevant, n_tot AS n_nonrelevant,
       ROUND(CAST(SUM(t) AS DOUBLE) / CAST(r_tot AS DOUBLE), 6) AS bpref
FROM terms GROUP BY r_tot, n_tot
"""

QUERIES["q_bpref"] = QuerySpec(
    q_bpref,
    Q_BPREF_SQL,
    "bpref of the dense top-20 under label judgments — k-row judged "
    "list, nonrel-above prefix counts",
)

"""Round-10 surface extensions, batch CV (SURVEY §2.3 N r10): the
embedding-metric-geometry block — does the choice of similarity metric
change retrieval? Cosine-vs-dot rank agreement (top-20 overlap +
positional agreement for the pinned query vector: the first question
when configuring an ANN index), norm-rank bias (the Spearman
correlation between a candidate's NORM and its dot-product rank — dot
product rewards long vectors; this measures by how much), and the
mean-centering effect (top-20 overlap before vs after subtracting the
corpus centroid — the cheap isotropy fix of q_isotropy_audit,
quantified at the retrieval level).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: scores rounded to 6dp before every rank; shortlists
fully tie-broken by vec_id; overlap/agreement are integer counts;
Spearman runs on exact ranks with unique keys (no ties).
Scale: one embeddings scan per ranking; shortlists are k-row
(the q_rrf_fusion adjudication); the centroid is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import cosine, dot, with_norm
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_QV = 7
_K = 20

_N_SQL = """
  n AS (
    SELECT vec_id, embedding::DOUBLE[] AS e,
           sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
    FROM embeddings),
  q AS (SELECT e AS qe, nrm AS qn FROM n WHERE vec_id = {qv})
""".format(qv=_QV)


def _scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    norms = with_norm(load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id")
    qv = norms.where(F.col("id") == _QV).select(
        F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    return (
        norms.where(F.col("id") != _QV)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("id").alias("vec_id"),
            F.col("nrm"),
            F.round(dot(F.col("qe"), F.col("e")), 6).alias("dp"),
            F.round(
                cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")), 6
            ).alias("cos"),
        )
    )


_SCORES_SQL = f"""
  scores AS (
    SELECT vec_id, nrm,
           ROUND(list_inner_product(n.e, qe), 6) AS dp,
           ROUND(list_inner_product(n.e, qe) / (n.nrm * qn), 6) AS cos
    FROM n CROSS JOIN q WHERE vec_id <> {_QV})
"""


def q_metric_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scores(spark, sf_dir)
    top_cos = (
        sc.orderBy(F.col("cos").desc(), "vec_id")
        .limit(_K)
        .withColumn(
            "r_cos",
            F.row_number().over(Window.orderBy(F.col("cos").desc(), "vec_id")),
        )
        .select("vec_id", "r_cos")
    )
    top_dot = (
        sc.orderBy(F.col("dp").desc(), "vec_id")
        .limit(_K)
        .withColumn(
            "r_dot",
            F.row_number().over(Window.orderBy(F.col("dp").desc(), "vec_id")),
        )
        .select(F.col("vec_id").alias("vid2"), "r_dot")
    )
    j = top_cos.join(top_dot, top_cos.vec_id == top_dot.vid2, "full_outer")
    return j.agg(
        F.sum(
            (F.col("r_cos").isNotNull() & F.col("r_dot").isNotNull()).cast("long")
        ).alias("overlap"),
        F.sum((F.col("r_cos") == F.col("r_dot")).cast("long")).alias(
            "same_position"
        ),
        F.round(
            F.sum(
                (F.col("r_cos").isNotNull() & F.col("r_dot").isNotNull()).cast(
                    "long"
                )
            )
            / F.lit(float(_K)),
            6,
        ).alias("overlap_at_k"),
    )


Q_AGREE_SQL = f"""
WITH {_N_SQL},
{_SCORES_SQL},
top_cos AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r_cos
  FROM (SELECT vec_id, cos FROM scores ORDER BY cos DESC, vec_id LIMIT {_K})),
top_dot AS (
  SELECT vec_id AS vid2, ROW_NUMBER() OVER (ORDER BY dp DESC, vec_id) AS r_dot
  FROM (SELECT vec_id, dp FROM scores ORDER BY dp DESC, vec_id LIMIT {_K}))
SELECT CAST(SUM(CASE WHEN r_cos IS NOT NULL AND r_dot IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
       CAST(SUM(CASE WHEN r_cos = r_dot THEN 1 ELSE 0 END) AS BIGINT)
           AS same_position,
       ROUND(SUM(CASE WHEN r_cos IS NOT NULL AND r_dot IS NOT NULL
                      THEN 1 ELSE 0 END) / {float(_K)}, 6) AS overlap_at_k
FROM top_cos FULL OUTER JOIN top_dot ON top_cos.vec_id = top_dot.vid2
"""

QUERIES["q_metric_rank_agreement"] = QuerySpec(
    q_metric_rank_agreement,
    Q_AGREE_SQL,
    "cosine-vs-dot top-20 agreement for the pinned query — overlap and "
    "positional matches, k-row lists",
)


def q_norm_rank_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman correlation between candidate norm and dot-product
    score over ALL candidates (exact ranks, unique vec_id tiebreak)."""
    # two distributed exact ranks (no corpus-sized global window),
    # joined back on the key — the _dist_rank pattern
    from kcore_spark.queries.extensions_r8 import _dist_rank

    sc = _scores(spark, sf_dir).localCheckpoint()
    rn = _dist_rank(sc.select("vec_id", "nrm"), [F.col("nrm"), F.col("vec_id")]).select(
        "vec_id", F.col("rk").cast("double").alias("rn")
    )
    rd = _dist_rank(sc.select("vec_id", "dp"), [F.col("dp"), F.col("vec_id")]).select(
        F.col("vec_id").alias("vid2"), F.col("rk").cast("double").alias("rd")
    )
    ranked = rn.join(rd, rn.vec_id == rd.vid2).select("rn", "rd")
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round((F.col("rn") - F.col("rd")) * (F.col("rn") - F.col("rd")), 1)
              .cast("decimal(38,1)"))
        .cast("double")
        .alias("s_d2"),
    )
    nd = F.col("n").cast("double")
    rho = 1.0 - 6.0 * F.col("s_d2") / (nd * (nd * nd - 1.0))
    return mom.select("n", F.round(rho, 6).alias("spearman_norm_dot"))


Q_NORMBIAS_SQL = f"""
WITH {_N_SQL},
{_SCORES_SQL},
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY nrm, vec_id) AS DOUBLE) AS rn,
         CAST(ROW_NUMBER() OVER (ORDER BY dp, vec_id) AS DOUBLE) AS rd
  FROM scores),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND((rn - rd) * (rn - rd), 1) AS DECIMAL(38,1)))
              AS DOUBLE) AS s_d2
  FROM ranked)
SELECT n,
       ROUND(1.0 - 6.0 * s_d2
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                - 1.0)), 6) AS spearman_norm_dot
FROM mom
"""

QUERIES["q_norm_rank_bias"] = QuerySpec(
    q_norm_rank_bias,
    Q_NORMBIAS_SQL,
    "Spearman of candidate norm vs dot-product score — quantifies the "
    "long-vector bias of dot retrieval",
)


def q_centering_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 cosine overlap before vs after subtracting the corpus
    centroid from every vector (query included)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    d = emb.select("vec_id", F.posexplode("e").alias("pos", "x"))
    centroid = d.groupBy("pos").agg(
        (
            F.sum(F.round("x", 10).cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    cd = d.join(F.broadcast(centroid), "pos").select(
        "vec_id", "pos", (F.col("x") - F.col("c")).alias("xc"), "x"
    )
    qv = cd.where(F.col("vec_id") == _QV).select(
        F.col("pos").alias("qpos"), F.col("xc").alias("qxc"), F.col("x").alias("qx")
    )
    pairs = (
        cd.where(F.col("vec_id") != _QV)
        .join(F.broadcast(qv), F.col("pos") == F.col("qpos"))
        .groupBy("vec_id")
        .agg(
            F.sum(F.round(F.col("x") * F.col("qx"), 10).cast("decimal(38,10)"))
            .cast("double")
            .alias("dp_raw"),
            F.sum(F.round(F.col("x") * F.col("x"), 10).cast("decimal(38,10)"))
            .cast("double")
            .alias("nn_raw"),
            F.sum(F.round(F.col("xc") * F.col("qxc"), 10).cast("decimal(38,10)"))
            .cast("double")
            .alias("dp_c"),
            F.sum(F.round(F.col("xc") * F.col("xc"), 10).cast("decimal(38,10)"))
            .cast("double")
            .alias("nn_c"),
        )
    )
    qn = qv.groupBy().agg(
        F.sum(F.round(F.col("qx") * F.col("qx"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("qq_raw"),
        F.sum(F.round(F.col("qxc") * F.col("qxc"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("qq_c"),
    )
    scored = pairs.crossJoin(F.broadcast(qn)).select(
        "vec_id",
        F.round(
            F.col("dp_raw") / F.sqrt(F.col("nn_raw") * F.col("qq_raw")), 6
        ).alias("cos_raw"),
        F.round(F.col("dp_c") / F.sqrt(F.col("nn_c") * F.col("qq_c")), 6).alias(
            "cos_c"
        ),
    )
    top_raw = (
        scored.orderBy(F.col("cos_raw").desc(), "vec_id").limit(_K).select("vec_id")
    )
    top_c = (
        scored.orderBy(F.col("cos_c").desc(), "vec_id")
        .limit(_K)
        .select(F.col("vec_id").alias("vid2"))
    )
    j = top_raw.join(top_c, top_raw.vec_id == top_c.vid2, "full_outer")
    return j.agg(
        F.sum(
            (F.col("vec_id").isNotNull() & F.col("vid2").isNotNull()).cast("long")
        ).alias("overlap"),
        F.round(
            F.sum(
                (F.col("vec_id").isNotNull() & F.col("vid2").isNotNull()).cast(
                    "long"
                )
            )
            / F.lit(float(_K)),
            6,
        ).alias("overlap_at_k"),
    )


Q_CENTER_SQL = f"""
WITH d AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings),
centroid AS (
  SELECT pos,
         CAST(SUM(CAST(ROUND(x, 10) AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*)
             AS c
  FROM d GROUP BY pos),
cd AS (
  SELECT vec_id, d.pos AS pos, x - c AS xc, x
  FROM d JOIN centroid ON d.pos = centroid.pos),
qv AS (
  SELECT pos AS qpos, xc AS qxc, x AS qx FROM cd WHERE vec_id = {_QV}),
pairs AS (
  SELECT vec_id,
         CAST(SUM(CAST(ROUND(x * qx, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS dp_raw,
         CAST(SUM(CAST(ROUND(x * x, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS nn_raw,
         CAST(SUM(CAST(ROUND(xc * qxc, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS dp_c,
         CAST(SUM(CAST(ROUND(xc * xc, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS nn_c
  FROM cd JOIN qv ON cd.pos = qv.qpos
  WHERE vec_id <> {_QV}
  GROUP BY vec_id),
qn AS (
  SELECT CAST(SUM(CAST(ROUND(qx * qx, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS qq_raw,
         CAST(SUM(CAST(ROUND(qxc * qxc, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS qq_c
  FROM qv),
scored AS (
  SELECT vec_id,
         ROUND(dp_raw / SQRT(nn_raw * qq_raw), 6) AS cos_raw,
         ROUND(dp_c / SQRT(nn_c * qq_c), 6) AS cos_c
  FROM pairs CROSS JOIN qn),
top_raw AS (
  SELECT vec_id FROM scored ORDER BY cos_raw DESC, vec_id LIMIT {_K}),
top_c AS (
  SELECT vec_id AS vid2 FROM scored ORDER BY cos_c DESC, vec_id LIMIT {_K})
SELECT CAST(SUM(CASE WHEN vec_id IS NOT NULL AND vid2 IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
       ROUND(SUM(CASE WHEN vec_id IS NOT NULL AND vid2 IS NOT NULL
                      THEN 1 ELSE 0 END) / {float(_K)}, 6) AS overlap_at_k
FROM top_raw FULL OUTER JOIN top_c ON top_raw.vec_id = top_c.vid2
"""

QUERIES["q_centering_effect"] = QuerySpec(
    q_centering_effect,
    Q_CENTER_SQL,
    "top-20 retrieval overlap before vs after corpus-centroid "
    "centering — posexplode dot algebra, k-row lists",
)

"""Round-10 surface extensions, batch AQ (SURVEY §2.3 N r10): the
clustering-comparison block — normalized mutual information, the
Fowlkes-Mallows index, and cluster purity, computed between the
fixture's embedding labels and the same derived equal-width bucket
labeling q_adjusted_rand pins (so the four pair-counting /
information-theoretic comparison measures share one contingency
construction and can be cross-read).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer contingency cells; entropy/MI terms are
ROUND(·,12)-pinned decimal sums over the k1×k2 cells; pair counts
are integer-exact.
Scale: one groupBy builds the contingency; everything after is
k1×k2-row algebra with broadcast margins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _label_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency of fixture label × equal-width dim-1 bucket (the
    q_adjusted_rand labeling, kept in lockstep)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.element_at(F.col("embedding").cast("array<double>"), 1).alias("x0")
    )
    rng = emb.agg(F.min("x0").alias("lo"), F.max("x0").alias("hi"))
    lab2 = emb.crossJoin(F.broadcast(rng)).select(
        "label",
        F.least(
            F.lit(3),
            F.floor((F.col("x0") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 4.0)),
        )
        .cast("long")
        .alias("bucket"),
    )
    return lab2.groupBy("label", "bucket").agg(F.count(F.lit(1)).alias("nij"))


_CELLS_SQL = """
  SELECT label, bucket, COUNT(*) AS nij
  FROM (
    SELECT label,
           LEAST(3, CAST(FLOOR((x0 - lo) / ((hi - lo) / 4.0)) AS BIGINT)) AS bucket
    FROM (SELECT label, embedding[1]::DOUBLE AS x0 FROM embeddings)
    CROSS JOIN (SELECT MIN(embedding[1]::DOUBLE) AS lo,
                       MAX(embedding[1]::DOUBLE) AS hi FROM embeddings))
  GROUP BY label, bucket
"""


# ------------------------------------------------------------- NMI
# I(U;V) = Σ (nij/n)·ln(n·nij/(ai·bj)); NMI = I/√(H(U)·H(V)).


def q_nmi_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _label_cells(spark, sf_dir)
    am = cells.groupBy("label").agg(F.sum("nij").alias("ai"))
    bm = cells.groupBy("bucket").agg(F.sum("nij").alias("bj"))
    tot = cells.agg(F.sum("nij").alias("n"))

    def _ent(margin: DataFrame, col: str, out: str) -> DataFrame:
        p = F.col(col).cast("double") / F.col("n").cast("double")
        return (
            margin.crossJoin(F.broadcast(tot))
            .select(F.round(-p * F.log(p), 12).cast("decimal(28,12)").alias("t"))
            .agg(F.sum("t").cast("double").alias(out))
        )

    hu = _ent(am, "ai", "hu")
    hv = _ent(bm, "bj", "hv")
    pij = F.col("nij").cast("double") / F.col("n").cast("double")
    lift = (
        F.col("n").cast("double")
        * F.col("nij").cast("double")
        / (F.col("ai").cast("double") * F.col("bj").cast("double"))
    )
    mi = (
        cells.join(F.broadcast(am), "label")
        .join(F.broadcast(bm), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(F.round(pij * F.log(lift), 12).cast("decimal(28,12)").alias("t"))
        .agg(F.sum("t").cast("double").alias("mi"))
    )
    return (
        mi.crossJoin(hu)
        .crossJoin(hv)
        .select(
            F.round("mi", 6).alias("mutual_info"),
            F.round("hu", 6).alias("h_labels"),
            F.round("hv", 6).alias("h_buckets"),
            F.round(
                F.col("mi") / F.sqrt(F.col("hu") * F.col("hv")), 6
            ).alias("nmi"),
        )
    )


Q_NMI_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
am AS (SELECT label, SUM(nij) AS ai FROM cells GROUP BY label),
bm AS (SELECT bucket, SUM(nij) AS bj FROM cells GROUP BY bucket),
tot AS (SELECT SUM(nij) AS n FROM cells),
hu AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(ai AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(ai AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS hu
  FROM am CROSS JOIN tot),
hv AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(bj AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(bj AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS hv
  FROM bm CROSS JOIN tot),
mi AS (
  SELECT CAST(SUM(CAST(ROUND((CAST(nij AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(n AS DOUBLE) * CAST(nij AS DOUBLE)
                                  / (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE))), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS mi
  FROM cells JOIN am USING (label) JOIN bm USING (bucket) CROSS JOIN tot)
SELECT ROUND(mi, 6) AS mutual_info,
       ROUND(hu, 6) AS h_labels,
       ROUND(hv, 6) AS h_buckets,
       ROUND(mi / SQRT(hu * hv), 6) AS nmi
FROM mi CROSS JOIN hu CROSS JOIN hv
"""

QUERIES["q_nmi_labels"] = QuerySpec(
    q_nmi_labels,
    Q_NMI_SQL,
    "normalized mutual information between labels and the bucket "
    "labeling — pinned MI/entropy sums over the contingency",
)


# --------------------------------------------------- Fowlkes-Mallows
# FM = TP/√((TP+FP)(TP+FN)) with TP = ΣC(nij,2), TP+FP = ΣC(ai,2),
# TP+FN = ΣC(bj,2). Integer-exact.


def q_fowlkes_mallows(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _label_cells(spark, sf_dir)
    c2 = lambda x: x * (x - 1) / F.lit(2.0)  # noqa: E731
    tp = cells.agg(F.sum(c2(F.col("nij"))).alias("tp"))
    pa = cells.groupBy("label").agg(F.sum("nij").alias("ai")).agg(
        F.sum(c2(F.col("ai"))).alias("pa")
    )
    pb = cells.groupBy("bucket").agg(F.sum("nij").alias("bj")).agg(
        F.sum(c2(F.col("bj"))).alias("pb")
    )
    return (
        tp.crossJoin(pa)
        .crossJoin(pb)
        .select(
            F.col("tp").cast("long").alias("tp_pairs"),
            F.col("pa").cast("long").alias("label_pairs"),
            F.col("pb").cast("long").alias("bucket_pairs"),
            F.round(
                F.col("tp") / F.sqrt(F.col("pa") * F.col("pb")), 6
            ).alias("fowlkes_mallows"),
        )
    )


Q_FM_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
tp AS (SELECT SUM(nij * (nij - 1) / 2.0) AS tp FROM cells),
pa AS (SELECT SUM(ai * (ai - 1) / 2.0) AS pa
       FROM (SELECT SUM(nij) AS ai FROM cells GROUP BY label)),
pb AS (SELECT SUM(bj * (bj - 1) / 2.0) AS pb
       FROM (SELECT SUM(nij) AS bj FROM cells GROUP BY bucket))
SELECT CAST(tp AS BIGINT) AS tp_pairs,
       CAST(pa AS BIGINT) AS label_pairs,
       CAST(pb AS BIGINT) AS bucket_pairs,
       ROUND(tp / SQRT(pa * pb), 6) AS fowlkes_mallows
FROM tp CROSS JOIN pa CROSS JOIN pb
"""

QUERIES["q_fowlkes_mallows"] = QuerySpec(
    q_fowlkes_mallows,
    Q_FM_SQL,
    "Fowlkes-Mallows index — integer pair counts from the shared "
    "contingency",
)


# ----------------------------------------------------------- purity
# Clusters = buckets; purity = Σ_bucket max_label nij / n, plus the
# per-bucket majority table.


def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _label_cells(spark, sf_dir)
    best = cells.groupBy("bucket").agg(
        F.sum("nij").alias("n_bucket"),
        F.max("nij").alias("n_major"),
    )
    return best.select(
        "bucket",
        F.col("n_bucket").cast("long").alias("n_bucket"),
        F.col("n_major").cast("long").alias("n_majority"),
        F.round(
            F.col("n_major").cast("double") / F.col("n_bucket").cast("double"), 6
        ).alias("bucket_purity"),
    ).orderBy("bucket")


Q_PURITY_SQL = f"""
WITH cells AS ({_CELLS_SQL})
SELECT bucket,
       CAST(SUM(nij) AS BIGINT) AS n_bucket,
       CAST(MAX(nij) AS BIGINT) AS n_majority,
       ROUND(CAST(MAX(nij) AS DOUBLE) / CAST(SUM(nij) AS DOUBLE), 6)
           AS bucket_purity
FROM cells
GROUP BY bucket
ORDER BY bucket
"""

QUERIES["q_cluster_purity"] = QuerySpec(
    q_cluster_purity,
    Q_PURITY_SQL,
    "per-bucket majority purity — one max over the contingency",
)

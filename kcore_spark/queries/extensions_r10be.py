"""Round-10 surface extensions, batch BE (SURVEY §2.3 N r10): the
graph II block — Jaccard + preferential-attachment link prediction
(the two classic features next to q_link_prediction_aa's Adamic-Adar,
sharing its capped per-part pair generation), a continuous power-law
MLE fit of the supplier degree distribution (Clauset-style α̂ above a
fixed dmin), and the degree CCDF at a literal log grid (the log-log
scale-free diagnostic plot as a table).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer degree/pair counts; pinned log sums; the pair
space is fan-out-capped per part exactly like the AA query (hub
parts dropped BEFORE array collection).
Scale: never all supplier pairs — bounded map-side double explode;
degrees and CCDF are one keyed rollup plus k-row grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_MAX_FANOUT = 50
_TOPK = 20


# ----------------------------------- Jaccard + PA link prediction
# Same capped bipartite pair space as q_link_prediction_aa; degrees
# are computed over the SAME capped edge set so |A∩B| ≤ min(|A|,|B|)
# holds internally. jaccard = c/(d1+d2−c); pa = d1·d2.


def q_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    keep = (
        li.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where((F.col("deg") >= 2) & (F.col("deg") <= _MAX_FANOUT))
        .select("pk")
    )
    capped = li.join(keep, "pk")
    sdeg = capped.groupBy("sk").agg(F.count(F.lit(1)).alias("d"))
    grp = (
        capped.groupBy("pk")
        .agg(F.sort_array(F.collect_set("sk")).alias("ss"))
        .repartition(spark.sparkContext.defaultParallelism, "pk")
    )
    pairs = (
        grp.select(F.explode("ss").alias("s1"), "ss")
        .select("s1", F.explode("ss").alias("s2"))
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
    )
    j = pairs.join(
        F.broadcast(sdeg.select(F.col("sk").alias("s1"), F.col("d").alias("d1"))),
        "s1",
    ).join(
        F.broadcast(sdeg.select(F.col("sk").alias("s2"), F.col("d").alias("d2"))),
        "s2",
    )
    jac = F.col("c").cast("double") / (
        F.col("d1") + F.col("d2") - F.col("c")
    ).cast("double")
    scored = j.select(
        "s1",
        "s2",
        F.col("c").cast("long").alias("common_parts"),
        F.round(jac, 6).alias("jaccard"),
        (F.col("d1") * F.col("d2")).cast("long").alias("pref_attach"),
    )
    return scored.orderBy(
        F.col("jaccard").desc(), "s1", "s2"
    ).limit(_TOPK)


Q_JACCARD_LP_SQL = f"""
WITH li AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
keep AS (
  SELECT pk FROM li GROUP BY pk
  HAVING COUNT(*) BETWEEN 2 AND {_MAX_FANOUT}),
capped AS (SELECT li.* FROM li JOIN keep USING (pk)),
sdeg AS (SELECT sk, COUNT(*) AS d FROM capped GROUP BY sk),
pairs AS (
  SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.pk = b.pk AND a.sk < b.sk
  GROUP BY a.sk, b.sk
  HAVING COUNT(*) >= 2),
scored AS (
  SELECT s1, s2, CAST(c AS BIGINT) AS common_parts,
         ROUND(CAST(c AS DOUBLE) / CAST(da.d + db.d - c AS DOUBLE), 6) AS jaccard,
         CAST(da.d * db.d AS BIGINT) AS pref_attach,
         ROW_NUMBER() OVER (ORDER BY CAST(c AS DOUBLE)
                                     / CAST(da.d + db.d - c AS DOUBLE) DESC,
                            s1, s2) AS rk
  FROM pairs JOIN sdeg da ON s1 = da.sk JOIN sdeg db ON s2 = db.sk)
SELECT s1, s2, common_parts, jaccard, pref_attach
FROM scored WHERE rk <= {_TOPK}
ORDER BY jaccard DESC, s1, s2
"""

QUERIES["q_jaccard_link_prediction"] = QuerySpec(
    q_jaccard_link_prediction,
    Q_JACCARD_LP_SQL,
    "Jaccard + preferential-attachment link prediction over the "
    "capped supplier-part graph — map-side pair explode, top-20",
)


# ------------------------------------------------- power-law MLE fit
# Supplier degrees (full bipartite degree); continuous MLE above
# dmin = 2: α̂ = 1 + n / Σ ln(d/(dmin − 0.5)).


def q_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    deg = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("d"))
    tail = deg.where(F.col("d") >= 2)
    agg = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(
            F.round(F.log(F.col("d").cast("double") / 1.5), 12).cast(
                "decimal(28,12)"
            )
        ).alias("s"),
    )
    return agg.select(
        "n_tail",
        F.round(
            1.0 + F.col("n_tail").cast("double") / F.col("s").cast("double"), 6
        ).alias("powerlaw_alpha"),
    )


Q_POWERLAW_SQL = """
WITH li AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
deg AS (SELECT l_suppkey, COUNT(*) AS d FROM li GROUP BY 1),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
         SUM(CAST(ROUND(LN(CAST(d AS DOUBLE) / 1.5), 12) AS DECIMAL(28,12))) AS s
  FROM deg WHERE d >= 2)
SELECT n_tail,
       ROUND(1.0 + CAST(n_tail AS DOUBLE) / CAST(s AS DOUBLE), 6)
           AS powerlaw_alpha
FROM agg
"""

QUERIES["q_powerlaw_fit"] = QuerySpec(
    q_powerlaw_fit,
    Q_POWERLAW_SQL,
    "continuous power-law MLE of supplier degrees above dmin=2 — "
    "one degree rollup, pinned log sum",
)


# ---------------------------------------------------- degree CCDF
# P(deg >= k) at k ∈ {1,2,4,8,16,32,64}: the log-log diagnostic.


def q_degree_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    deg = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("d"))
    ks = [1, 2, 4, 8, 16, 32, 64]
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum((F.col("d") >= k).cast("long")).alias(f"c{k}")
            for k in ks
        ],
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.col(f"c{k}").alias("n_ge"),
                        F.round(
                            F.col(f"c{k}").cast("double")
                            / F.col("n").cast("double"),
                            6,
                        ).alias("ccdf"),
                    )
                    for k in ks
                ]
            )
        ).alias("g")
    )
    return rows.select(
        F.col("g.k").cast("long").alias("min_degree"),
        F.col("g.n_ge").cast("long").alias("n_ge"),
        F.col("g.ccdf").alias("ccdf"),
    ).orderBy("min_degree")


Q_CCDF_SQL = """
WITH li AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
deg AS (SELECT l_suppkey, COUNT(*) AS d FROM li GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
grid AS (SELECT UNNEST([1, 2, 4, 8, 16, 32, 64]) AS k)
SELECT CAST(k AS BIGINT) AS min_degree,
       CAST(SUM(CASE WHEN d >= k THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       ROUND(CAST(SUM(CASE WHEN d >= k THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(ANY_VALUE(n) AS DOUBLE), 6) AS ccdf
FROM deg CROSS JOIN grid CROSS JOIN n
GROUP BY k
ORDER BY min_degree
"""

QUERIES["q_degree_ccdf"] = QuerySpec(
    q_degree_ccdf,
    Q_CCDF_SQL,
    "degree CCDF at a literal log grid — one degree rollup, 7 "
    "parallel threshold counts",
)

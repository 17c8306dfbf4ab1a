"""Round-10 surface extensions, batch AP (SURVEY §2.3 N r10): the
categorical-association block — Cramér's V (chi²-normalized nominal
association; the effect size q_chi2_feature_select doesn't report),
Goodman-Kruskal gamma (ordinal concordance from the contingency
table, the tie-ignoring sibling of q_kendall_tau), and Theil's
uncertainty coefficient U(Y|X) (the asymmetric information-theoretic
association, I(X;Y)/H(Y)).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: everything reduces to the INTEGER contingency table;
entropy terms are ROUND(·,12)-pinned decimal sums over the k×k
cells; one final ROUND per statistic.
Scale: one grouped count builds the contingency (the only
corpus-sized shuffle); every subsequent step is k×k-row algebra
(k = 5 here), broadcast everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _seg_prio_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency of customer segment × order priority."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("r"), F.col("o_orderpriority").alias("c")
        )
        .agg(F.count(F.lit(1)).alias("nij"))
    )


_CELLS_SQL = """
  SELECT c_mktsegment AS r, o_orderpriority AS c, COUNT(*) AS nij
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
"""


# --------------------------------------------------------- Cramér's V
# chi² from integer cells and margins; V = √(chi²/(n·(min(R,C)−1))).


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _seg_prio_cells(spark, sf_dir)
    rm = cells.groupBy("r").agg(F.sum("nij").alias("nr"))
    cm = cells.groupBy("c").agg(F.sum("nij").alias("nc"))
    tot = cells.agg(
        F.sum("nij").alias("n"),
        F.countDistinct("r").alias("nr_cats"),
        F.countDistinct("c").alias("nc_cats"),
    )
    j = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("nr").cast("double") * F.col("nc").cast("double") / F.col("n").cast(
        "double"
    )
    term = (F.col("nij").cast("double") - e) ** 2 / e
    agg = j.agg(
        F.first("n").cast("long").alias("n"),
        F.first("nr_cats").cast("long").alias("r_cats"),
        F.first("nc_cats").cast("long").alias("c_cats"),
        F.sum(F.round(term, 9).cast("decimal(28,9)")).alias("chi2"),
    )
    k = F.least(F.col("r_cats"), F.col("c_cats")) - 1
    return agg.select(
        "n",
        "r_cats",
        "c_cats",
        F.round(F.col("chi2").cast("double"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2").cast("double")
                / (F.col("n").cast("double") * k.cast("double"))
            ),
            6,
        ).alias("cramers_v"),
    )


Q_CRAMERS_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
rm AS (SELECT r, SUM(nij) AS nr FROM cells GROUP BY r),
cm AS (SELECT c, SUM(nij) AS nc FROM cells GROUP BY c),
tot AS (SELECT SUM(nij) AS n, COUNT(DISTINCT r) AS nr_cats,
               COUNT(DISTINCT c) AS nc_cats FROM cells),
agg AS (
  SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
         CAST(ANY_VALUE(nr_cats) AS BIGINT) AS r_cats,
         CAST(ANY_VALUE(nc_cats) AS BIGINT) AS c_cats,
         SUM(CAST(ROUND((CAST(nij AS DOUBLE)
                         - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(nij AS DOUBLE)
                           - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
                        / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)),
                        9) AS DECIMAL(28,9))) AS chi2
  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot)
SELECT n, r_cats, c_cats,
       ROUND(CAST(chi2 AS DOUBLE), 6) AS chi2,
       ROUND(SQRT(CAST(chi2 AS DOUBLE)
                  / (CAST(n AS DOUBLE)
                     * CAST(LEAST(r_cats, c_cats) - 1 AS DOUBLE))), 6) AS cramers_v
FROM agg
"""

QUERIES["q_cramers_v"] = QuerySpec(
    q_cramers_v,
    Q_CRAMERS_SQL,
    "Cramér's V for segment × priority — integer contingency, "
    "pinned chi² cell sum, k×k algebra",
)


# -------------------------------------------- Goodman-Kruskal gamma
# Ordinal pair: quantity band × price band per lineitem. From the
# contingency table: C = Σ nij · N(i'>i, j'>j), D = Σ nij ·
# N(i'>i, j'<j); gamma = (C−D)/(C+D). The cell-pair join is k²×k².


def q_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    band_q = F.least(F.lit(4), F.floor(F.col("l_quantity") / 13)).cast("long")
    band_p = F.least(F.lit(4), F.floor(F.col("l_extendedprice") / 20000)).cast("long")
    cells = li.select(band_q.alias("i"), band_p.alias("j")).groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("nij")
    )
    other = cells.select(
        F.col("i").alias("i2"), F.col("j").alias("j2"), F.col("nij").alias("n2")
    )
    pairs = cells.join(
        F.broadcast(other),
        (F.col("i2") > F.col("i"))
        & (F.col("j2") != F.col("j")),
    )
    conc = F.when(F.col("j2") > F.col("j"), F.col("nij") * F.col("n2")).otherwise(
        F.lit(0)
    )
    disc = F.when(F.col("j2") < F.col("j"), F.col("nij") * F.col("n2")).otherwise(
        F.lit(0)
    )
    agg = pairs.agg(F.sum(conc).alias("c"), F.sum(disc).alias("d"))
    return agg.select(
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d")).cast("double")
            / (F.col("c") + F.col("d")).cast("double"),
            6,
        ).alias("gk_gamma"),
    )


Q_GK_GAMMA_SQL = """
WITH cells AS (
  SELECT LEAST(4, CAST(FLOOR(l_quantity / 13) AS BIGINT)) AS i,
         LEAST(4, CAST(FLOOR(l_extendedprice / 20000) AS BIGINT)) AS j,
         COUNT(*) AS nij
  FROM lineitem GROUP BY 1, 2),
pairs AS (
  SELECT a.nij, b.nij AS n2, a.j, b.j AS j2
  FROM cells a JOIN cells b ON b.i > a.i AND b.j <> a.j),
agg AS (
  SELECT SUM(CASE WHEN j2 > j THEN nij * n2 ELSE 0 END) AS c,
         SUM(CASE WHEN j2 < j THEN nij * n2 ELSE 0 END) AS d
  FROM pairs)
SELECT CAST(c AS BIGINT) AS concordant,
       CAST(d AS BIGINT) AS discordant,
       ROUND(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 6) AS gk_gamma
FROM agg
"""

QUERIES["q_gk_gamma"] = QuerySpec(
    q_gk_gamma,
    Q_GK_GAMMA_SQL,
    "Goodman-Kruskal gamma over quantity × price bands — integer "
    "concordance from the k² cell-pair join",
)


# ------------------------------------- Theil's uncertainty coefficient
# U(Y|X) = (H(Y) − H(Y|X)) / H(Y) with Y = priority, X = segment.
# H terms from the integer cells with pinned-decimal entropy sums.


def q_uncertainty_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _seg_prio_cells(spark, sf_dir)
    tot = cells.agg(F.sum("nij").alias("n"))
    cm = cells.groupBy("c").agg(F.sum("nij").alias("nc"))
    rm = cells.groupBy("r").agg(F.sum("nij").alias("nr"))
    # H(Y)
    hy = (
        cm.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("nc").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("nc").cast("double") / F.col("n").cast("double")),
                12,
            )
            .cast("decimal(28,12)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hy"))
    )
    # H(Y|X) = -Σ_ij (nij/n) ln(nij/nr)
    hyx = (
        cells.join(F.broadcast(rm), "r")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("nij").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("nij").cast("double") / F.col("nr").cast("double")),
                12,
            )
            .cast("decimal(28,12)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hyx"))
    )
    return hy.crossJoin(hyx).select(
        F.round("hy", 6).alias("h_y"),
        F.round("hyx", 6).alias("h_y_given_x"),
        F.round((F.col("hy") - F.col("hyx")) / F.col("hy"), 6).alias(
            "uncertainty_coeff"
        ),
    )


Q_UNCERT_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
tot AS (SELECT SUM(nij) AS n FROM cells),
cm AS (SELECT c, SUM(nij) AS nc FROM cells GROUP BY c),
rm AS (SELECT r, SUM(nij) AS nr FROM cells GROUP BY r),
hy AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS hy
  FROM cm CROSS JOIN tot),
hyx AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(nij AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(nij AS DOUBLE) / CAST(nr AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS hyx
  FROM cells JOIN rm USING (r) CROSS JOIN tot)
SELECT ROUND(hy, 6) AS h_y,
       ROUND(hyx, 6) AS h_y_given_x,
       ROUND((hy - hyx) / hy, 6) AS uncertainty_coeff
FROM hy CROSS JOIN hyx
"""

QUERIES["q_uncertainty_coeff"] = QuerySpec(
    q_uncertainty_coeff,
    Q_UNCERT_SQL,
    "Theil's uncertainty coefficient U(priority|segment) — pinned "
    "entropy sums over the integer contingency",
)

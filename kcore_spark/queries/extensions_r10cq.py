"""Round-10 surface extensions, batch CQ (SURVEY §2.3 N r10): the
index-number block, second wave, extending q_price_index's matched
1995->1997 basket — the chained-vs-direct Laspeyres comparison (chain
drift: multiply year-over-year links 1995->1996->1997 and see how far
the product lands from the direct index), the unit-value index
decomposition (UVI = pure price change x basket-mix effect — the
customs-data classic), and the von Bortkiewicz identity (the
Paasche/Laspeyres gap IS the weighted covariance of price and quantity
relatives — both sides computed independently and reported, the
economic content of "expensive things sold less").

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: part-year cells use the q_price_index pinned p/q
construction (decimal sums, price rounded to 9); all cross-part sums
are rounded-decimal folds.
Scale: one lineitem scan folds to part-year cells; links join on the
part key; everything after is scalar algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_YEARS = [1995, 1996, 1997]


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(*_YEARS)
    )
    return (
        li.groupBy("l_partkey", F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("qd"),
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)")).alias("vd"),
        )
        .select(
            "l_partkey",
            "yr",
            F.col("qd").cast("double").alias("q"),
            F.round(F.col("vd").cast("double") / F.col("qd").cast("double"), 9)
            .alias("p"),
            F.col("vd").cast("double").alias("v"),
        )
    )


_CELLS_SQL = f"""
  cells AS (
    SELECT l_partkey, yr,
           CAST(qd AS DOUBLE) AS q,
           ROUND(CAST(vd AS DOUBLE) / CAST(qd AS DOUBLE), 9) AS p,
           CAST(vd AS DOUBLE) AS v
    FROM (
      SELECT l_partkey, YEAR(l_shipdate) AS yr,
             SUM(CAST(l_quantity AS DECIMAL(15,2))) AS qd,
             SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS vd
      FROM lineitem WHERE YEAR(l_shipdate) IN ({", ".join(map(str, _YEARS))})
      GROUP BY 1, 2))
"""


def _link(cells: DataFrame, y0: int, y1: int, tag: str) -> DataFrame:
    a = cells.where(F.col("yr") == y0).select(
        "l_partkey", F.col("q").alias("q0"), F.col("p").alias("p0")
    )
    b = cells.where(F.col("yr") == y1).select(
        "l_partkey", F.col("p").alias("p1")
    )
    j = a.join(b, "l_partkey")
    return j.agg(
        F.lit(tag).alias("link"),
        F.sum(F.round(F.col("p1") * F.col("q0"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p1q0"),
        F.sum(F.round(F.col("p0") * F.col("q0"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p0q0"),
    )


def _link_sql(y0: int, y1: int, tag: str) -> str:
    return f"""
    SELECT '{tag}' AS link,
           CAST(SUM(CAST(ROUND(b.p * a.q, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS p1q0,
           CAST(SUM(CAST(ROUND(a.p * a.q, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS p0q0
    FROM (SELECT l_partkey, q, p FROM cells WHERE yr = {y0}) a
    JOIN (SELECT l_partkey, p FROM cells WHERE yr = {y1}) b
      ON a.l_partkey = b.l_partkey
  """


def q_chained_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _cells(spark, sf_dir)
    l01 = _link(cells, 1995, 1996, "l01").select(
        (F.col("p1q0") / F.col("p0q0")).alias("l01")
    )
    l12 = _link(cells, 1996, 1997, "l12").select(
        (F.col("p1q0") / F.col("p0q0")).alias("l12")
    )
    l02 = _link(cells, 1995, 1997, "l02").select(
        (F.col("p1q0") / F.col("p0q0")).alias("direct")
    )
    j = l01.crossJoin(F.broadcast(l12)).crossJoin(F.broadcast(l02))
    chained = F.col("l01") * F.col("l12")
    return j.select(
        F.round("l01", 6).alias("link_95_96"),
        F.round("l12", 6).alias("link_96_97"),
        F.round(chained, 6).alias("chained_laspeyres"),
        F.round("direct", 6).alias("direct_laspeyres"),
        F.round(chained / F.col("direct") - 1.0, 6).alias("chain_drift"),
    )


Q_CHAIN_SQL = f"""
WITH {_CELLS_SQL},
l01 AS (SELECT p1q0 / p0q0 AS l01 FROM ({_link_sql(1995, 1996, "l01")})),
l12 AS (SELECT p1q0 / p0q0 AS l12 FROM ({_link_sql(1996, 1997, "l12")})),
l02 AS (SELECT p1q0 / p0q0 AS direct FROM ({_link_sql(1995, 1997, "l02")}))
SELECT ROUND(l01, 6) AS link_95_96,
       ROUND(l12, 6) AS link_96_97,
       ROUND(l01 * l12, 6) AS chained_laspeyres,
       ROUND(direct, 6) AS direct_laspeyres,
       ROUND(l01 * l12 / direct - 1.0, 6) AS chain_drift
FROM l01 CROSS JOIN l12 CROSS JOIN l02
"""

QUERIES["q_chained_index"] = QuerySpec(
    q_chained_index,
    Q_CHAIN_SQL,
    "chained vs direct Laspeyres 1995->1997 with the chain-drift gap — "
    "matched-basket year links, decimal folds",
)


def q_unit_value_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _cells(spark, sf_dir)
    a = cells.where(F.col("yr") == 1995).select(
        "l_partkey",
        F.col("q").alias("q0"),
        F.col("p").alias("p0"),
        F.col("v").alias("v0"),
    )
    b = cells.where(F.col("yr") == 1997).select(
        "l_partkey",
        F.col("q").alias("q1"),
        F.col("p").alias("p1"),
        F.col("v").alias("v1"),
    )
    j = a.join(b, "l_partkey")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.round("v0", 4).cast("decimal(38,4)")).cast("double").alias("sv0"),
        F.sum(F.round("v1", 4).cast("decimal(38,4)")).cast("double").alias("sv1"),
        F.sum(F.round("q0", 4).cast("decimal(38,4)")).cast("double").alias("sq0"),
        F.sum(F.round("q1", 4).cast("decimal(38,4)")).cast("double").alias("sq1"),
        F.sum(F.round(F.col("p1") * F.col("q0"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p1q0"),
        F.sum(F.round(F.col("p0") * F.col("q0"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p0q0"),
    )
    uvi = (F.col("sv1") / F.col("sq1")) / (F.col("sv0") / F.col("sq0"))
    lasp = F.col("p1q0") / F.col("p0q0")
    return agg.select(
        "n_parts",
        F.round(uvi, 6).alias("unit_value_index"),
        F.round(lasp, 6).alias("laspeyres_price"),
        F.round(uvi / lasp, 6).alias("mix_effect"),
    )


Q_UVI_SQL = f"""
WITH {_CELLS_SQL},
j AS (
  SELECT a.l_partkey, a.q AS q0, a.p AS p0, a.v AS v0,
         b.q AS q1, b.p AS p1, b.v AS v1
  FROM (SELECT * FROM cells WHERE yr = 1995) a
  JOIN (SELECT * FROM cells WHERE yr = 1997) b
    ON a.l_partkey = b.l_partkey),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CAST(ROUND(v0, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sv0,
         CAST(SUM(CAST(ROUND(v1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sv1,
         CAST(SUM(CAST(ROUND(q0, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sq0,
         CAST(SUM(CAST(ROUND(q1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sq1,
         CAST(SUM(CAST(ROUND(p1 * q0, 4) AS DECIMAL(38,4))) AS DOUBLE) AS p1q0,
         CAST(SUM(CAST(ROUND(p0 * q0, 4) AS DECIMAL(38,4))) AS DOUBLE) AS p0q0
  FROM j)
SELECT n_parts,
       ROUND((sv1 / sq1) / (sv0 / sq0), 6) AS unit_value_index,
       ROUND(p1q0 / p0q0, 6) AS laspeyres_price,
       ROUND(((sv1 / sq1) / (sv0 / sq0)) / (p1q0 / p0q0), 6) AS mix_effect
FROM agg
"""

QUERIES["q_unit_value_index"] = QuerySpec(
    q_unit_value_index,
    Q_UVI_SQL,
    "unit-value index decomposed into Laspeyres price change x basket "
    "mix effect — matched 1995/1997 basket",
)


def q_bortkiewicz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides of the von Bortkiewicz identity: P/L - 1 equals the
    q0-value-weighted covariance of price and quantity relatives over
    (L_p * L_q)."""
    cells = _cells(spark, sf_dir)
    a = cells.where(F.col("yr") == 1995).select(
        "l_partkey", F.col("q").alias("q0"), F.col("p").alias("p0")
    )
    b = cells.where(F.col("yr") == 1997).select(
        "l_partkey", F.col("q").alias("q1"), F.col("p").alias("p1")
    )
    j = a.join(b, "l_partkey").select(
        (F.col("p0") * F.col("q0")).alias("w"),
        (F.col("p1") / F.col("p0")).alias("rp"),
        (F.col("q1") / F.col("q0")).alias("rq"),
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.round("w", 4).cast("decimal(38,4)")).cast("double").alias("sw"),
        F.sum(F.round(F.col("w") * F.col("rp"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("swp"),
        F.sum(F.round(F.col("w") * F.col("rq"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("swq"),
        F.sum(
            F.round(F.col("w") * F.col("rp") * F.col("rq"), 4)
            .cast("decimal(38,4)")
        )
        .cast("double")
        .alias("swpq"),
    )
    lp = F.col("swp") / F.col("sw")
    lq = F.col("swq") / F.col("sw")
    paasche_over_lasp = (F.col("swpq") / F.col("swq")) / lp
    cov_term = (F.col("swpq") / F.col("sw") - lp * lq) / (lp * lq)
    return agg.select(
        "n_parts",
        F.round(lp, 6).alias("laspeyres_p"),
        F.round(lq, 6).alias("laspeyres_q"),
        F.round(paasche_over_lasp - 1.0, 6).alias("paasche_gap"),
        F.round(cov_term, 6).alias("weighted_cov_term"),
        # + 0.0 folds IEEE negative zero into positive zero (both engines)
        (F.round(paasche_over_lasp - 1.0 - cov_term, 6) + F.lit(0.0)).alias(
            "identity_residual"
        ),
    )


Q_BORT_SQL = f"""
WITH {_CELLS_SQL},
j AS (
  SELECT a.p * a.q AS w, b.p / a.p AS rp, b.q / a.q AS rq
  FROM (SELECT * FROM cells WHERE yr = 1995) a
  JOIN (SELECT * FROM cells WHERE yr = 1997) b
    ON a.l_partkey = b.l_partkey),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CAST(ROUND(w, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(ROUND(w * rp, 4) AS DECIMAL(38,4))) AS DOUBLE) AS swp,
         CAST(SUM(CAST(ROUND(w * rq, 4) AS DECIMAL(38,4))) AS DOUBLE) AS swq,
         CAST(SUM(CAST(ROUND(w * rp * rq, 4) AS DECIMAL(38,4))) AS DOUBLE)
             AS swpq
  FROM j)
SELECT n_parts,
       ROUND(swp / sw, 6) AS laspeyres_p,
       ROUND(swq / sw, 6) AS laspeyres_q,
       ROUND((swpq / swq) / (swp / sw) - 1.0, 6) AS paasche_gap,
       ROUND((swpq / sw - (swp / sw) * (swq / sw))
             / ((swp / sw) * (swq / sw)), 6) AS weighted_cov_term,
       ROUND((swpq / swq) / (swp / sw) - 1.0
             - (swpq / sw - (swp / sw) * (swq / sw))
               / ((swp / sw) * (swq / sw)), 6) + 0.0 AS identity_residual
FROM agg
"""

QUERIES["q_bortkiewicz"] = QuerySpec(
    q_bortkiewicz,
    Q_BORT_SQL,
    "von Bortkiewicz decomposition: Paasche/Laspeyres gap vs the "
    "weighted covariance of relatives — both sides, residual reported",
)

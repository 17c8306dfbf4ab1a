"""Round-10 surface extensions, batch CU (SURVEY §2.3 N r10): the
supply-chain block, second wave — the bullwhip ratio (variance of
upstream monthly SHIPPED quantity over variance of downstream monthly
ORDERED demand, overall and per-brand: the demand-amplification
diagnostic), the ABC-XYZ planning matrix (the joint value-vs-
volatility cross-classification that q_abc_classification and
q_xyz_classification each report only one margin of), and demand risk
pooling (CV of POOLED monthly demand vs the average per-region CV —
how much volatility does centralizing inventory remove?).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: monthly quantities are decimal sums (the
q_xyz_classification cell construction); per-part/region CVs rounded
to 9; class cut-offs pinned (ABC 80/95 cumulative share via the
distributed cumsum; XYZ 0.5/1.0).
Scale: everything folds to (part|region, month) cells then per-key
moments; the ABC rank uses _dist_cumsum (no global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_cumsum

QUERIES: dict[str, QuerySpec] = {}


def q_bullwhip_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_mon"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_trunc("month", F.col("o_orderdate")).alias("ord_mon")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    demand = j.groupBy(F.col("ord_mon").alias("mon")).agg(
        F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q")
    )
    supply = j.groupBy(F.col("ship_mon").alias("mon")).agg(
        F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q")
    )

    def var_of(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"k_{name}"),
            F.sum("q").alias(f"s1_{name}"),
            F.sum((F.col("q") * F.col("q")).cast("decimal(38,4)")).alias(
                f"s2_{name}"
            ),
        )

    d = var_of(demand, "d")
    s = var_of(supply, "s")
    jj = d.crossJoin(F.broadcast(s))

    def v(name: str):
        kd = F.col(f"k_{name}").cast("double")
        s1 = F.col(f"s1_{name}").cast("double")
        s2 = F.col(f"s2_{name}").cast("double")
        return (kd * s2 - s1**2) / (kd * (kd - 1.0))

    def cv(name: str):
        kd = F.col(f"k_{name}").cast("double")
        s1 = F.col(f"s1_{name}").cast("double")
        return F.sqrt(v(name)) / (s1 / kd)

    return jj.select(
        F.col("k_d").alias("n_demand_months"),
        F.col("k_s").alias("n_supply_months"),
        F.round(cv("d"), 6).alias("cv_demand"),
        F.round(cv("s"), 6).alias("cv_supply"),
        F.round((cv("s") * cv("s")) / (cv("d") * cv("d")), 6).alias(
            "bullwhip_ratio"
        ),
    )


Q_BULLWHIP_SQL = """
WITH j AS (
  SELECT l_quantity,
         date_trunc('month', o_orderdate) AS ord_mon,
         date_trunc('month', l_shipdate) AS ship_mon
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
demand AS (
  SELECT ord_mon AS mon, SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM j GROUP BY 1),
supply AS (
  SELECT ship_mon AS mon, SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM j GROUP BY 1),
d AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_d, SUM(q) AS s1_d,
         SUM(CAST(q * q AS DECIMAL(38,4))) AS s2_d
  FROM demand),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_s, SUM(q) AS s1_s,
         SUM(CAST(q * q AS DECIMAL(38,4))) AS s2_s
  FROM supply)
SELECT k_d AS n_demand_months, k_s AS n_supply_months,
       ROUND(SQRT((CAST(k_d AS DOUBLE) * CAST(s2_d AS DOUBLE)
                   - POWER(CAST(s1_d AS DOUBLE), 2))
                  / (CAST(k_d AS DOUBLE) * (CAST(k_d AS DOUBLE) - 1.0)))
             / (CAST(s1_d AS DOUBLE) / CAST(k_d AS DOUBLE)), 6) AS cv_demand,
       ROUND(SQRT((CAST(k_s AS DOUBLE) * CAST(s2_s AS DOUBLE)
                   - POWER(CAST(s1_s AS DOUBLE), 2))
                  / (CAST(k_s AS DOUBLE) * (CAST(k_s AS DOUBLE) - 1.0)))
             / (CAST(s1_s AS DOUBLE) / CAST(k_s AS DOUBLE)), 6) AS cv_supply,
       ROUND(((CAST(k_s AS DOUBLE) * CAST(s2_s AS DOUBLE)
               - POWER(CAST(s1_s AS DOUBLE), 2))
              / (CAST(k_s AS DOUBLE) * (CAST(k_s AS DOUBLE) - 1.0))
              / POWER(CAST(s1_s AS DOUBLE) / CAST(k_s AS DOUBLE), 2))
             / ((CAST(k_d AS DOUBLE) * CAST(s2_d AS DOUBLE)
                 - POWER(CAST(s1_d AS DOUBLE), 2))
                / (CAST(k_d AS DOUBLE) * (CAST(k_d AS DOUBLE) - 1.0))
                / POWER(CAST(s1_d AS DOUBLE) / CAST(k_d AS DOUBLE), 2)), 6)
           AS bullwhip_ratio
FROM d CROSS JOIN s
"""

QUERIES["q_bullwhip_effect"] = QuerySpec(
    q_bullwhip_effect,
    Q_BULLWHIP_SQL,
    "bullwhip ratio: CV^2 of monthly shipped vs ordered quantity — "
    "two calendar-bounded series from one join",
)


def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", F.col("l_shipdate")).alias("mon")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(38,0)")
        ).alias("cents"),
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum("cents").alias("rev"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    sd = F.sqrt(
        (kd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (kd * (kd - 1))
    )
    eligible = per_part.where(F.col("k") >= 3).select(
        "l_partkey", "rev", F.round(sd / mean, 9).alias("cv")
    )
    tot = eligible.agg(F.sum("rev").alias("tot_rev"))
    ranked = _dist_cumsum(
        eligible, [(-F.col("rev")), F.col("l_partkey")], "rev"
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.col("cum").cast("double") / F.col("tot_rev").cast("double") <= 0.8,
            "A",
        )
        .when(
            F.col("cum").cast("double") / F.col("tot_rev").cast("double") <= 0.95,
            "B",
        )
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "rev",
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("rev").cast("double") / 100.0, 2).alias("revenue"),
        )
        .orderBy("abc", "xyz")
    )


Q_ABCXYZ_SQL = """
WITH monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS mon,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS DECIMAL(38,0))) AS cents
  FROM lineitem GROUP BY 1, 2),
per_part AS (
  SELECT l_partkey, COUNT(*) AS k, SUM(q) AS s1, SUM(q * q) AS s2,
         SUM(cents) AS rev
  FROM monthly GROUP BY 1),
eligible AS (
  SELECT l_partkey, rev,
         ROUND(SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - POWER(CAST(s1 AS DOUBLE), 2))
                    / (CAST(k AS DOUBLE) * (k - 1)))
               / (CAST(s1 AS DOUBLE) / k), 9) AS cv
  FROM per_part WHERE k >= 3),
tot AS (SELECT SUM(rev) AS tot_rev FROM eligible),
ranked AS (
  SELECT l_partkey, rev, cv,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM eligible),
classed AS (
  SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(tot_rev AS DOUBLE) <= 0.8
              THEN 'A'
              WHEN CAST(cum AS DOUBLE) / CAST(tot_rev AS DOUBLE) <= 0.95
              THEN 'B' ELSE 'C' END AS abc,
         CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz,
         rev
  FROM ranked CROSS JOIN tot)
SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(rev) AS DOUBLE) / 100.0, 2) AS revenue
FROM classed GROUP BY 1, 2 ORDER BY abc, xyz
"""

QUERIES["q_abc_xyz_matrix"] = QuerySpec(
    q_abc_xyz_matrix,
    Q_ABCXYZ_SQL,
    "joint ABC (value, _dist_cumsum rank) x XYZ (volatility) planning "
    "matrix — the two margins' cross-classification",
)


def q_demand_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk pooling: average per-region monthly-demand CV vs the CV of
    the POOLED series; variance-reduction factor reported."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        F.date_trunc("month", F.col("l_shipdate")).alias("mon"),
        "l_suppkey",
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cells = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "mon")
        .agg(F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"))
    )
    per_region = cells.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    kd = F.col("k").cast("double")
    cvr = (
        F.sqrt(
            (kd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
            / (kd * (kd - 1))
        )
        / (F.col("s1").cast("double") / kd)
    )
    avg_cv = per_region.select(
        F.round(cvr, 9).cast("decimal(18,9)").alias("cv")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_regions"),
        (F.sum("cv").cast("double") / F.count(F.lit(1))).alias("avg_region_cv"),
    )
    pooled = cells.groupBy("mon").agg(F.sum("q").alias("q")).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("q").alias("s1"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,4)")).alias("s2"),
    )
    kp = F.col("k").cast("double")
    cvp = (
        F.sqrt(
            (kp * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
            / (kp * (kp - 1))
        )
        / (F.col("s1").cast("double") / kp)
    )
    pooled_cv = pooled.select(F.round(cvp, 9).alias("pooled_cv"))
    j = avg_cv.crossJoin(F.broadcast(pooled_cv))
    return j.select(
        "n_regions",
        F.round("avg_region_cv", 6).alias("avg_region_cv"),
        F.round("pooled_cv", 6).alias("pooled_cv"),
        F.round(1.0 - F.col("pooled_cv") / F.col("avg_region_cv"), 6).alias(
            "cv_reduction"
        ),
    )


Q_POOLING_SQL = """
WITH cells AS (
  SELECT n_regionkey, date_trunc('month', l_shipdate) AS mon,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2),
per_region AS (
  SELECT n_regionkey, COUNT(*) AS k, SUM(q) AS s1, SUM(q * q) AS s2
  FROM cells GROUP BY 1),
avg_cv AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_regions,
         CAST(SUM(CAST(ROUND(
             SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - POWER(CAST(s1 AS DOUBLE), 2))
                  / (CAST(k AS DOUBLE) * (k - 1)))
             / (CAST(s1 AS DOUBLE) / k), 9) AS DECIMAL(18,9))) AS DOUBLE)
           / COUNT(*) AS avg_region_cv
  FROM per_region),
pooled AS (
  SELECT COUNT(*) AS k, SUM(q) AS s1, SUM(CAST(q * q AS DECIMAL(38,4))) AS s2
  FROM (SELECT mon, SUM(q) AS q FROM cells GROUP BY mon)),
pooled_cv AS (
  SELECT ROUND(SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - POWER(CAST(s1 AS DOUBLE), 2))
                    / (CAST(k AS DOUBLE) * (k - 1)))
               / (CAST(s1 AS DOUBLE) / k), 9) AS pooled_cv
  FROM pooled)
SELECT n_regions,
       ROUND(avg_region_cv, 6) AS avg_region_cv,
       ROUND(pooled_cv, 6) AS pooled_cv,
       ROUND(1.0 - pooled_cv / avg_region_cv, 6) AS cv_reduction
FROM avg_cv CROSS JOIN pooled_cv
"""

QUERIES["q_demand_pooling"] = QuerySpec(
    q_demand_pooling,
    Q_POOLING_SQL,
    "risk pooling: pooled monthly-demand CV vs average regional CV — "
    "(region, month) cells, scalar folds",
)

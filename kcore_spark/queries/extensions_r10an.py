"""Round-10 surface extensions, batch AN (SURVEY §2.3 N r10): the
inventory-planning block — XYZ demand-variability classification
(the coefficient-of-variation twin of q_abc_classification's value
ranking), safety-stock / reorder-point planning (z·σ·√LT at a fixed
service level), and a fill-rate audit (share of lines servable at a
P90 stock level per brand) — the three tables a supply planner reads
together.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: per-key decimal moment sums; CVs are ROUND(·,9)-pinned
before the class-level average; the service-level z is the same
literal Φ⁻¹(0.95) the Q-Q table pins; exact per-brand percentiles
via the F.percentile <-> quantile_cont pairing.
Scale: part/brand-keyed rollups (one shuffle each); class tables are
3-row; the percentile join is a 25-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------- XYZ classification
# Monthly demand per part; CV = s/mean over that part's observed
# months (parts with <3 months are unclassifiable and excluded).
# X: CV <= 0.5, Y: <= 1.0, Z: above.


def q_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import spread

    # spread by l_partkey: the (part, month) decimal rollup otherwise
    # runs in the serial single-row-group scan task; both groupBys
    # below reuse this one exchange (clustering subset)
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_shipdate", "l_quantity"
        ),
        "l_partkey",
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", F.col("l_shipdate")).alias("mon")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"))
    per_part = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    sd = F.sqrt(
        (kd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (kd * (kd - 1))
    )
    cv = per_part.where(F.col("k") >= 3).select(
        F.round(sd / mean, 9).alias("cv")
    )
    classed = cv.select(
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "cv",
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum(F.col("cv").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cv"),
        )
        .orderBy("xyz_class")
    )


Q_XYZ_SQL = """
WITH monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS mon,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM lineitem GROUP BY 1, 2),
per_part AS (
  SELECT l_partkey, COUNT(*) AS k, SUM(q) AS s1, SUM(q * q) AS s2
  FROM monthly GROUP BY 1),
cv AS (
  SELECT ROUND(SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1)))
               / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)), 9) AS cv
  FROM per_part WHERE k >= 3)
SELECT CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END
           AS xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(cv AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
           AS avg_cv
FROM cv
GROUP BY 1
ORDER BY xyz_class
"""

QUERIES["q_xyz_classification"] = QuerySpec(
    q_xyz_classification,
    Q_XYZ_SQL,
    "XYZ demand-variability classes from monthly per-part CV — "
    "decimal moments, pinned CVs, 3-row output",
)


# --------------------------------------------- safety stock / ROP
# Per brand: daily demand mean/sd over observed ship days; lead time
# 7 days, service level 95% (z = 1.644854, the Q-Q literal).
# SS = z·σ_d·√7; ROP = 7·mean_d + SS.


def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.date_trunc("day", F.col("l_shipdate")).alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"))
    )
    m = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    sd = F.sqrt(
        (kd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (kd * (kd - 1))
    )
    ss = 1.644854 * sd * F.sqrt(F.lit(7.0))
    return m.select(
        "p_brand",
        F.col("k").cast("long").alias("n_days"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(sd, 6).alias("sd_daily"),
        F.round(ss, 6).alias("safety_stock"),
        F.round(7.0 * mean + ss, 6).alias("reorder_point"),
    ).orderBy("p_brand")


Q_SAFETY_SQL = """
WITH daily AS (
  SELECT p_brand, date_trunc('day', l_shipdate) AS d,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2),
m AS (
  SELECT p_brand, COUNT(*) AS k, SUM(q) AS s1, SUM(q * q) AS s2
  FROM daily GROUP BY 1)
SELECT p_brand,
       CAST(k AS BIGINT) AS n_days,
       ROUND(CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE), 6) AS mean_daily,
       ROUND(SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1))), 6) AS sd_daily,
       ROUND(1.644854 * SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                             / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1)))
             * SQRT(7.0), 6) AS safety_stock,
       ROUND(7.0 * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
             + 1.644854 * SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                               / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1)))
               * SQRT(7.0), 6) AS reorder_point
FROM m
ORDER BY p_brand
"""

QUERIES["q_safety_stock"] = QuerySpec(
    q_safety_stock,
    Q_SAFETY_SQL,
    "safety stock + reorder point per brand at 95% service over a "
    "7-day lead time — daily decimal moments",
)


# -------------------------------------------------------- fill rate
# Stock level per brand set at the P90 of line quantities; fill rate
# = share of lines whose quantity fits, volume fill = share of
# quantity units served (partial fills allowed).


def q_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select("p_brand", F.col("l_quantity").cast("double").alias("q"))
    p90 = base.groupBy("p_brand").agg(F.percentile("q", 0.90).alias("stock"))
    j = base.join(F.broadcast(p90), "p_brand")
    served = F.least(F.col("q"), F.col("stock"))
    agg = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.first("stock").alias("stock"),
        F.sum((F.col("q") <= F.col("stock")).cast("long")).alias("full_lines"),
        F.sum(F.round(served, 4).cast("decimal(28,4)")).alias("served_units"),
        F.sum(F.round(F.col("q"), 4).cast("decimal(28,4)")).alias("asked_units"),
    )
    return agg.select(
        "p_brand",
        "n_lines",
        F.round("stock", 4).alias("stock_p90"),
        F.round(
            F.col("full_lines").cast("double") / F.col("n_lines").cast("double"), 6
        ).alias("line_fill_rate"),
        F.round(
            F.col("served_units").cast("double") / F.col("asked_units").cast("double"),
            6,
        ).alias("volume_fill_rate"),
    ).orderBy("p_brand")


Q_FILL_SQL = """
WITH base AS (
  SELECT p_brand, CAST(l_quantity AS DOUBLE) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey),
p90 AS (SELECT p_brand, quantile_cont(q, 0.90) AS stock FROM base GROUP BY 1),
agg AS (
  SELECT base.p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
         ANY_VALUE(stock) AS stock,
         CAST(SUM(CASE WHEN q <= stock THEN 1 ELSE 0 END) AS BIGINT) AS full_lines,
         SUM(CAST(ROUND(LEAST(q, stock), 4) AS DECIMAL(28,4))) AS served_units,
         SUM(CAST(ROUND(q, 4) AS DECIMAL(28,4))) AS asked_units
  FROM base JOIN p90 ON base.p_brand = p90.p_brand
  GROUP BY base.p_brand)
SELECT p_brand, n_lines,
       ROUND(stock, 4) AS stock_p90,
       ROUND(CAST(full_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
           AS line_fill_rate,
       ROUND(CAST(served_units AS DOUBLE) / CAST(asked_units AS DOUBLE), 6)
           AS volume_fill_rate
FROM agg
ORDER BY p_brand
"""

QUERIES["q_fill_rate"] = QuerySpec(
    q_fill_rate,
    Q_FILL_SQL,
    "line/volume fill rate at a P90 stock level per brand — exact "
    "percentile broadcast, decimal-pinned unit sums",
)

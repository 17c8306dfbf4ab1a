"""Round-10 surface extensions, batch DE (SURVEY §2.3 N r10): the
auction-analytics block — treat each part's line items as bids in a
sealed auction. Second-price revenue (what a Vickrey auction would
clear vs the first-price take — partitioned top-2, no sort of the
world), the reserve-price sweep (seller revenue as the reserve rises:
unsold lots vs price support — the knob every marketplace tunes), and
the revenue-equivalence check (for uniform i.i.d. bids theory says
E[2nd]/E[1st] = (n-1)/(n+1); the empirical ratio per bid-count tells
you how far real bid distributions sit from the textbook).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: bids are integer cents; top-2 picks are partitioned
ranks with line-key tiebreaks; per-group sums are decimal.
Scale: everything is a part-partitioned rank or keyed fold; the
reserve grid is a 4-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_RESERVES = [1000000, 2000000, 3000000, 4000000]  # cents


def _top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part with >= 2 bids: highest and second-highest bid cents."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("bid"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("bid").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    ranked = li.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 2)
    best = ranked.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max(F.when(F.col("rk") == 1, F.col("bid"))).alias("b1"),
        F.max(F.when(F.col("rk") == 2, F.col("bid"))).alias("b2"),
    )
    return best.where(F.col("k") == 2).select("l_partkey", "b1", "b2")


_TOP2_SQL = """
  bids AS (
    SELECT l_partkey,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS bid,
           ROW_NUMBER() OVER (PARTITION BY l_partkey
                              ORDER BY ROUND(l_extendedprice * 100, 0) DESC,
                                       l_orderkey, l_linenumber) AS rk
    FROM lineitem),
  top2 AS (
    SELECT l_partkey,
           MAX(CASE WHEN rk = 1 THEN bid END) AS b1,
           MAX(CASE WHEN rk = 2 THEN bid END) AS b2
    FROM bids WHERE rk <= 2
    GROUP BY l_partkey
    HAVING COUNT(*) = 2)
"""


def q_second_price_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t2 = _top2(spark, sf_dir)
    agg = t2.agg(
        F.count(F.lit(1)).cast("long").alias("n_auctions"),
        F.sum(F.col("b1").cast("decimal(38,0)")).alias("rev1"),
        F.sum(F.col("b2").cast("decimal(38,0)")).alias("rev2"),
    )
    return agg.select(
        "n_auctions",
        F.round(F.col("rev1").cast("double") / 100.0, 2).alias(
            "first_price_revenue"
        ),
        F.round(F.col("rev2").cast("double") / 100.0, 2).alias(
            "second_price_revenue"
        ),
        F.round(
            F.col("rev2").cast("double") / F.col("rev1").cast("double"), 6
        ).alias("vickrey_discount"),
    )


Q_SECOND_SQL = f"""
WITH {_TOP2_SQL}
SELECT CAST(COUNT(*) AS BIGINT) AS n_auctions,
       ROUND(CAST(SUM(CAST(b1 AS DECIMAL(38,0))) AS DOUBLE) / 100.0, 2)
           AS first_price_revenue,
       ROUND(CAST(SUM(CAST(b2 AS DECIMAL(38,0))) AS DOUBLE) / 100.0, 2)
           AS second_price_revenue,
       ROUND(CAST(SUM(CAST(b2 AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(CAST(b1 AS DECIMAL(38,0))) AS DOUBLE), 6)
           AS vickrey_discount
FROM top2
"""

QUERIES["q_second_price_revenue"] = QuerySpec(
    q_second_price_revenue,
    Q_SECOND_SQL,
    "Vickrey vs first-price clearing revenue over per-part bid pools — "
    "partitioned top-2, decimal folds",
)


def q_reserve_price_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    t2 = _top2(spark, sf_dir)
    grid = F.array(*[F.lit(r) for r in _RESERVES])
    fan = t2.select("b1", "b2", F.explode(grid).alias("reserve"))
    sold = fan.where(F.col("b1") >= F.col("reserve"))
    per = sold.groupBy("reserve").agg(
        F.count(F.lit(1)).cast("long").alias("n_sold"),
        F.sum(
            F.greatest(F.col("b2"), F.col("reserve")).cast("decimal(38,0)")
        ).alias("rev"),
    )
    tot = t2.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("reserve") / 100.0, 2).alias("reserve_price"),
            "n_sold",
            F.round(
                F.col("n_sold") / F.col("n_all").cast("double"), 6
            ).alias("sell_through"),
            F.round(F.col("rev").cast("double") / 100.0, 2).alias(
                "revenue_with_reserve"
            ),
        )
        .orderBy("reserve_price")
    )


Q_RESERVE_SQL = f"""
WITH {_TOP2_SQL},
fan AS (
  SELECT b1, b2, reserve
  FROM top2 CROSS JOIN
    (SELECT UNNEST([{", ".join(str(r) for r in _RESERVES)}]) AS reserve) g),
per AS (
  SELECT reserve, CAST(COUNT(*) AS BIGINT) AS n_sold,
         SUM(CAST(GREATEST(b2, reserve) AS DECIMAL(38,0))) AS rev
  FROM fan WHERE b1 >= reserve GROUP BY reserve),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM top2)
SELECT ROUND(reserve / 100.0, 2) AS reserve_price,
       n_sold,
       ROUND(n_sold / CAST(n_all AS DOUBLE), 6) AS sell_through,
       ROUND(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue_with_reserve
FROM per CROSS JOIN tot
ORDER BY reserve_price
"""

QUERIES["q_reserve_price_sweep"] = QuerySpec(
    q_reserve_price_sweep,
    Q_RESERVE_SQL,
    "reserve-price sweep: sell-through vs revenue under a Vickrey-with-"
    "reserve rule — 4-row grid fan on the top-2 table",
)


def q_revenue_equivalence_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per bid-count n (2..6) over (part, ship-year) auctions: the
    empirical E[2nd]/E[1st] vs the uniform-theory (n-1)/(n+1)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("bid"),
    )
    w = Window.partitionBy("l_partkey", "yr").orderBy(
        F.col("bid").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    ranked = li.withColumn("rk", F.row_number().over(w))
    per_part = ranked.groupBy("l_partkey", "yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_bids"),
        F.max(F.when(F.col("rk") == 1, F.col("bid"))).alias("b1"),
        F.max(F.when(F.col("rk") == 2, F.col("bid"))).alias("b2"),
    )
    pool = per_part.where(F.col("n_bids").between(2, 6))
    agg = pool.groupBy("n_bids").agg(
        F.count(F.lit(1)).cast("long").alias("n_auctions"),
        F.sum(F.col("b1").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("b2").cast("decimal(38,0)")).alias("s2"),
    )
    ratio = F.col("s2").cast("double") / F.col("s1").cast("double")
    nd = F.col("n_bids").cast("double")
    theory = (nd - 1.0) / (nd + 1.0)
    return agg.select(
        "n_bids",
        "n_auctions",
        F.round(ratio, 6).alias("empirical_ratio"),
        F.round(theory, 6).alias("uniform_theory_ratio"),
        F.round(ratio - theory, 6).alias("gap"),
    ).orderBy("n_bids")


Q_REVEQ_SQL = """
WITH bids AS (
  SELECT l_partkey, YEAR(l_shipdate) AS yr,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS bid,
         ROW_NUMBER() OVER (PARTITION BY l_partkey, YEAR(l_shipdate)
                            ORDER BY ROUND(l_extendedprice * 100, 0) DESC,
                                     l_orderkey, l_linenumber) AS rk
  FROM lineitem),
per_part AS (
  SELECT l_partkey, yr, CAST(COUNT(*) AS BIGINT) AS n_bids,
         MAX(CASE WHEN rk = 1 THEN bid END) AS b1,
         MAX(CASE WHEN rk = 2 THEN bid END) AS b2
  FROM bids GROUP BY 1, 2),
agg AS (
  SELECT n_bids, CAST(COUNT(*) AS BIGINT) AS n_auctions,
         SUM(CAST(b1 AS DECIMAL(38,0))) AS s1,
         SUM(CAST(b2 AS DECIMAL(38,0))) AS s2
  FROM per_part WHERE n_bids BETWEEN 2 AND 6
  GROUP BY n_bids)
SELECT n_bids, n_auctions,
       ROUND(CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 6) AS empirical_ratio,
       ROUND((n_bids - 1.0) / (n_bids + 1.0), 6) AS uniform_theory_ratio,
       ROUND(CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE)
             - (n_bids - 1.0) / (n_bids + 1.0), 6) AS gap
FROM agg ORDER BY n_bids
"""

QUERIES["q_revenue_equivalence_check"] = QuerySpec(
    q_revenue_equivalence_check,
    Q_REVEQ_SQL,
    "revenue-equivalence calibration: empirical E[2nd]/E[1st] per "
    "bid count vs the uniform-theory (n-1)/(n+1)",
)

"""Round-10 surface extensions, batch BA (SURVEY §2.3 N r10): the
commerce II block — net/gross revenue retention by month (the SaaS
board metric: same-customer revenue carried month over month),
Pareto concentration (revenue share of the top-20% customers at the
exact P80 cut — the 80/20 check next to q_lorenz_curve / q_supplier_
hhi), and the association-measure completion (leverage and conviction
for brand co-purchase pairs — the two measures q_assoc_rules' lift
table doesn't report).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal-exact revenue sums; integer basket counts;
exact percentile threshold; one final ROUND per ratio.
Scale: customer-month rollups with PARTITIONED lags; the brand-pair
space is bounded (≤25² pairs per order) by construction; the P80
cut is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------------------------- revenue retention NRR/GRR
# Customer-month revenue; for each consecutive observed month PAIR of
# a customer, the prior month's revenue is the base. NRR_t =
# Σ rev_t(retained)/Σ rev_{t-1}; GRR_t caps each customer at its
# prior-month revenue (contraction only).


def q_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cm = orders.groupBy(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("mon")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(15,2)")).alias("rev"))
    w = Window.partitionBy("o_custkey").orderBy("mon")
    lagged = (
        cm.withColumn("prev_mon", F.lag("mon").over(w))
        .withColumn("prev_rev", F.lag("rev").over(w))
        .where(
            F.col("prev_mon").isNotNull()
            & (F.col("mon") == F.add_months(F.col("prev_mon"), 1))
        )
    )
    agg = lagged.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("n_retained"),
        F.sum("prev_rev").cast("double").alias("base"),
        F.sum("rev").cast("double").alias("cur"),
        F.sum(F.least(F.col("rev"), F.col("prev_rev"))).cast("double").alias("capped"),
    )
    return agg.select(
        F.unix_timestamp("mon").alias("month_epoch"),
        "n_retained",
        F.round(F.col("cur") / F.col("base"), 6).alias("nrr"),
        F.round(F.col("capped") / F.col("base"), 6).alias("grr"),
    ).orderBy("month_epoch")


Q_NRR_SQL = """
WITH cm AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS rev
  FROM orders GROUP BY 1, 2),
lagged AS (
  SELECT mon, rev,
         LAG(mon) OVER (PARTITION BY o_custkey ORDER BY mon) AS prev_mon,
         LAG(rev) OVER (PARTITION BY o_custkey ORDER BY mon) AS prev_rev
  FROM cm
  QUALIFY prev_mon IS NOT NULL AND mon = prev_mon + INTERVAL 1 MONTH),
agg AS (
  SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_retained,
         CAST(SUM(prev_rev) AS DOUBLE) AS base,
         CAST(SUM(rev) AS DOUBLE) AS cur,
         CAST(SUM(LEAST(rev, prev_rev)) AS DOUBLE) AS capped
  FROM lagged GROUP BY mon)
SELECT CAST(epoch(mon) AS BIGINT) AS month_epoch, n_retained,
       ROUND(cur / base, 6) AS nrr,
       ROUND(capped / base, 6) AS grr
FROM agg
ORDER BY month_epoch
"""

QUERIES["q_revenue_retention"] = QuerySpec(
    q_revenue_retention,
    Q_NRR_SQL,
    "NRR/GRR by month from consecutive customer-month revenue pairs "
    "— partitioned lags, decimal sums",
)


# ------------------------------------------------------ Pareto share
# Customer lifetime revenue; cut at the exact P80; report the top-20%
# head's share of total revenue (and the head count).


def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
        .cast("double")
        .alias("rev")
    )
    cut = cust.agg(
        F.percentile("rev", 0.8).alias("p80"),
        F.count(F.lit(1)).cast("long").alias("n_cust"),
    )
    j = cust.crossJoin(F.broadcast(cut))
    agg = j.agg(
        F.first("n_cust").alias("n_cust"),
        F.first("p80").alias("p80"),
        F.sum(F.round(F.col("rev"), 2).cast("decimal(28,2)"))
        .cast("double")
        .alias("total"),
        F.sum(
            F.when(F.col("rev") > F.col("p80"), F.round(F.col("rev"), 2))
            .cast("decimal(28,2)")
        )
        .cast("double")
        .alias("head"),
        F.sum((F.col("rev") > F.col("p80")).cast("long")).alias("n_head"),
    )
    return agg.select(
        "n_cust",
        "n_head",
        F.round("p80", 2).alias("p80_revenue"),
        F.round(F.col("head") / F.col("total"), 6).alias("top20_share"),
    )


Q_PARETO_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
cut AS (SELECT quantile_cont(rev, 0.8) AS p80,
               CAST(COUNT(*) AS BIGINT) AS n_cust FROM cust),
agg AS (
  SELECT ANY_VALUE(n_cust) AS n_cust, ANY_VALUE(p80) AS p80,
         CAST(SUM(CAST(ROUND(rev, 2) AS DECIMAL(28,2))) AS DOUBLE) AS total,
         CAST(SUM(CASE WHEN rev > p80
                       THEN CAST(ROUND(rev, 2) AS DECIMAL(28,2)) END)
              AS DOUBLE) AS head,
         CAST(SUM(CASE WHEN rev > p80 THEN 1 ELSE 0 END) AS BIGINT) AS n_head
  FROM cust CROSS JOIN cut)
SELECT n_cust, n_head,
       ROUND(p80, 2) AS p80_revenue,
       ROUND(head / total, 6) AS top20_share
FROM agg
"""

QUERIES["q_pareto_share"] = QuerySpec(
    q_pareto_share,
    Q_PARETO_SQL,
    "top-20% customer revenue share at the exact P80 cut — 1-row "
    "broadcast threshold, decimal-pinned head/total sums",
)


# ------------------------------------- association measures II
# Brand co-purchase pairs within orders (bounded: ≤25 brands).
# leverage = s(XY) − s(X)s(Y); conviction = (1 − s(Y))/(1 − conf).
# Top 10 pairs by pair support, deterministic tiebreak.


def q_assoc_measures2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist
    from kcore_spark.operators.relational import spread

    # r13: baskets feeds FOUR branches (order count, brand supports,
    # both sides of the pair self-join) — persist it once. The spread
    # on l_orderkey parallelizes the broadcast-join + distinct off the
    # serial single-row-group scan, the distinct reuses the exchange
    # (clustering subset), and the cached partitioning makes the pair
    # self-join on l_orderkey exchange-free on both sides.
    li = spread(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = transient_persist(
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    brand_supp = baskets.groupBy("p_brand").agg(F.count(F.lit(1)).alias("nb"))
    other = baskets.select(
        F.col("l_orderkey").alias("ok2"), F.col("p_brand").alias("b2")
    )
    pairs = (
        baskets.join(other, (F.col("l_orderkey") == F.col("ok2")) & (F.col("p_brand") < F.col("b2")))
        .groupBy("p_brand", "b2")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    j = (
        pairs.join(F.broadcast(brand_supp), "p_brand")
        .join(
            F.broadcast(
                brand_supp.select(F.col("p_brand").alias("b2"), F.col("nb").alias("nb2"))
            ),
            "b2",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    n = F.col("n").cast("double")
    sx = F.col("nb").cast("double") / n
    sy = F.col("nb2").cast("double") / n
    sxy = F.col("nxy").cast("double") / n
    conf = sxy / sx
    scored = j.select(
        F.col("p_brand").alias("brand_a"),
        F.col("b2").alias("brand_b"),
        F.col("nxy").cast("long").alias("n_pair"),
        F.round(sxy, 6).alias("support"),
        F.round(sxy - sx * sy, 6).alias("leverage"),
        F.round((1.0 - sy) / (1.0 - conf), 6).alias("conviction"),
    )
    return scored.orderBy(
        F.col("n_pair").desc(), "brand_a", "brand_b"
    ).limit(10)


Q_ASSOC2_SQL = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM baskets),
brand_supp AS (SELECT p_brand, COUNT(*) AS nb FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.p_brand, b.p_brand AS b2, COUNT(*) AS nxy
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2),
j AS (
  SELECT p.p_brand, p.b2, p.nxy, sa.nb, sb.nb AS nb2, n
  FROM pairs p
  JOIN brand_supp sa ON p.p_brand = sa.p_brand
  JOIN brand_supp sb ON p.b2 = sb.p_brand
  CROSS JOIN n_orders)
SELECT p_brand AS brand_a, b2 AS brand_b,
       CAST(nxy AS BIGINT) AS n_pair,
       ROUND(CAST(nxy AS DOUBLE) / n, 6) AS support,
       ROUND(CAST(nxy AS DOUBLE) / n
             - (CAST(nb AS DOUBLE) / n) * (CAST(nb2 AS DOUBLE) / n), 6) AS leverage,
       ROUND((1.0 - CAST(nb2 AS DOUBLE) / n)
             / (1.0 - (CAST(nxy AS DOUBLE) / n) / (CAST(nb AS DOUBLE) / n)), 6)
           AS conviction
FROM j
ORDER BY n_pair DESC, brand_a, brand_b
LIMIT 10
"""

QUERIES["q_assoc_measures2"] = QuerySpec(
    q_assoc_measures2,
    Q_ASSOC2_SQL,
    "leverage + conviction for top brand co-purchase pairs — bounded "
    "brand-pair space, broadcast supports",
)

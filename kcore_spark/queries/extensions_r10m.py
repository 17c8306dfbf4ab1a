"""Round-10 surface extensions, batch M (SURVEY §2.3 N r10): the
trade-flow block — per-nation trade balance (demand-side customer
spend vs supply-side supplier revenue), the single-point-of-failure
supply concentration audit, and the region-by-region revenue flow
matrix. Multi-dimension star joins in the TPC-H Q5/Q7 family, with
all dimension joins broadcast.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all money stays in integer cents until the final
per-row division; orderings fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_CENTS = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731


# ------------------------------------------ per-nation trade balance
# Demand side: line revenue attributed to the CUSTOMER's nation;
# supply side: the same revenue attributed to the SUPPLIER's nation.
# Net = supply - demand per nation — the intra-dataset trade ledger
# (global totals balance to zero by construction, which the test
# asserts). One fact scan feeding two broadcast-dimension rollups.


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _CENTS("l_extendedprice").alias("cents")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    demand = fact.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.sum("cents").alias("demand_cents")
    )
    supply = fact.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.sum("cents").alias("supply_cents")
    )
    return (
        demand.join(supply, "nk", "full")
        .na.fill({"demand_cents": 0, "supply_cents": 0})
        .join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.round(F.col("demand_cents") / 100.0, 2).alias("demand_revenue"),
            F.round(F.col("supply_cents") / 100.0, 2).alias("supply_revenue"),
            F.round(
                (F.col("supply_cents") - F.col("demand_cents")) / 100.0, 2
            ).alias("net_balance"),
        )
        .orderBy("n_name")
    )


Q_BALANCE_SQL = """
WITH fact AS (
  SELECT CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents,
         c.c_nationkey, s.s_nationkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey),
demand AS (
  SELECT c_nationkey AS nk, SUM(cents) AS demand_cents
  FROM fact GROUP BY c_nationkey),
supply AS (
  SELECT s_nationkey AS nk, SUM(cents) AS supply_cents
  FROM fact GROUP BY s_nationkey)
SELECT n.n_name,
       ROUND(COALESCE(d.demand_cents, 0) / 100.0, 2) AS demand_revenue,
       ROUND(COALESCE(s.supply_cents, 0) / 100.0, 2) AS supply_revenue,
       ROUND((COALESCE(s.supply_cents, 0) - COALESCE(d.demand_cents, 0))
             / 100.0, 2) AS net_balance
FROM demand d
FULL JOIN supply s ON s.nk = d.nk
JOIN nation n ON n.n_nationkey = COALESCE(d.nk, s.nk)
ORDER BY n.n_name
"""

QUERIES["q_nation_trade_balance"] = QuerySpec(
    q_nation_trade_balance,
    Q_BALANCE_SQL,
    "per-nation trade balance (customer-side vs supplier-side revenue "
    "attribution, integer cents) — the internal trade ledger",
)


# --------------------------- supply single-point-of-failure audit
# Per part TYPE: the share of revenue flowing through the single
# biggest supplier — types above 40% are concentration risks. One
# keyed rollup + per-type max; the dimension join is broadcast.


def q_supplier_spof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _CENTS("l_extendedprice").alias("cents")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    per = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("cents").alias("cents"))
    )
    agg = per.groupBy("p_type").agg(
        F.sum("cents").alias("total"),
        F.max("cents").alias("top1"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    out = agg.select(
        "p_type",
        "n_suppliers",
        F.round(F.col("total") / 100.0, 2).alias("revenue"),
        F.round(F.col("top1") / F.col("total").cast("double"), 6).alias(
            "top1_share"
        ),
        (F.col("top1") * 5 > F.col("total") * 2).alias("spof_flag"),  # > 40%
    )
    return out.orderBy(F.col("top1_share").desc(), "p_type").limit(10)


Q_SPOF_SQL = """
WITH per AS (
  SELECT p.p_type, l.l_suppkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_type, l.l_suppkey),
agg AS (
  SELECT p_type, SUM(cents) AS total, MAX(cents) AS top1,
         COUNT(*) AS n_suppliers
  FROM per GROUP BY p_type)
SELECT p_type, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       ROUND(total / 100.0, 2) AS revenue,
       ROUND(top1 / CAST(total AS DOUBLE), 6) AS top1_share,
       top1 * 5 > total * 2 AS spof_flag
FROM agg
ORDER BY top1_share DESC, p_type
LIMIT 10
"""

QUERIES["q_supplier_spof"] = QuerySpec(
    q_supplier_spof,
    Q_SPOF_SQL,
    "supply single-point-of-failure audit per part type (top-1 "
    "supplier revenue share, integer cents) — concentration risk",
)


# ------------------------------------ region x region flow matrix
# Revenue matrix from customer region (buyer) to supplier region
# (seller) — the 5x5 trade-flow heatmap. Star joins all broadcast;
# integer cents.


def q_region_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _CENTS("l_extendedprice").alias("cents")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    buyer_r = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("r_name").alias("buyer_region"))
    )
    seller_r = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("r_name").alias("seller_region"))
    )
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(buyer_r), orders.o_custkey == buyer_r.c_custkey)
        .join(F.broadcast(seller_r), li.l_suppkey == seller_r.s_suppkey)
    )
    tot = fact.agg(F.sum("cents").alias("total"))
    return (
        fact.groupBy("buyer_region", "seller_region")
        .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).cast("long").alias("n_lines"))
        .crossJoin(F.broadcast(tot))
        .select(
            "buyer_region",
            "seller_region",
            "n_lines",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") / F.col("total").cast("double"), 6).alias(
                "flow_share"
            ),
        )
        .orderBy("buyer_region", "seller_region")
    )


Q_FLOW_SQL = """
WITH fact AS (
  SELECT rb.r_name AS buyer_region, rs.r_name AS seller_region,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nb ON nb.n_nationkey = c.c_nationkey
  JOIN region rb ON rb.r_regionkey = nb.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN region rs ON rs.r_regionkey = ns.n_regionkey),
tot AS (SELECT SUM(cents) AS total FROM fact)
SELECT buyer_region, seller_region,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(cents) / 100.0, 2) AS revenue,
       ROUND(SUM(cents) / CAST(ANY_VALUE(total) AS DOUBLE), 6) AS flow_share
FROM fact, tot
GROUP BY buyer_region, seller_region
ORDER BY buyer_region, seller_region
"""

QUERIES["q_region_flow_matrix"] = QuerySpec(
    q_region_flow_matrix,
    Q_FLOW_SQL,
    "region x region revenue flow matrix (buyer region vs seller "
    "region, broadcast star joins, integer cents)",
)

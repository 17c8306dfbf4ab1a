"""Round-10 surface extensions, batch U (SURVEY §2.3 N r10): the
operations-research block — Little's law accounting over the order
lifecycle (L = lambda * W as an IDENTITY when all three are measured
on the same window — the consistency check a flow dashboard runs),
the newsvendor critical-fractile quantity, and the EOQ economic
order quantity per part type.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all intervals are integer day arithmetic; quantiles pair
F.percentile with quantile_cont; EOQ is one closed-form double per
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------ Little's law ledger
# Order "in system" from o_orderdate to its last ship date. Over the
# full window: lambda = orders/day, W = mean days in system, L =
# total order-days / window days. L = lambda * W exactly (both sides
# are total order-days / window days) — the output carries the ratio
# as the self-check. Integer date arithmetic; one join + two rollups.


def q_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").alias("start")
    )
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max("l_shipdate").alias("finish"))
    )
    span = (
        orders.join(last_ship, "o_orderkey")
        .select(
            "o_orderkey",
            "start",
            "finish",
            (F.datediff(F.col("finish"), F.col("start")) + 1).alias("days_in_system"),
        )
    )
    m = span.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("days_in_system").alias("order_days"),
        F.min("start").alias("lo"),
        F.max("finish").alias("hi"),
    )
    window_days = (F.datediff(F.col("hi"), F.col("lo")) + 1).cast("double")
    lam = F.col("n_orders") / window_days
    w = F.col("order_days").cast("double") / F.col("n_orders")
    l = F.col("order_days").cast("double") / window_days
    return m.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.datediff(F.col("hi"), F.col("lo")) + 1).cast("long").alias("window_days"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(w, 6).alias("w_days"),
        F.round(l, 6).alias("l_in_system"),
        F.round(l / (lam * w), 6).alias("littles_ratio"),
    )


Q_LITTLE_SQL = """
WITH last_ship AS (
  SELECT l_orderkey AS o_orderkey, MAX(l_shipdate) AS finish
  FROM lineitem GROUP BY l_orderkey),
span AS (
  SELECT o.o_orderkey, o.o_orderdate AS start, s.finish,
         date_diff('day', o.o_orderdate, s.finish) + 1 AS days_in_system
  FROM orders o JOIN last_ship s USING (o_orderkey)),
m AS (
  SELECT COUNT(*) AS n_orders, SUM(days_in_system) AS order_days,
         MIN(start) AS lo, MAX(finish) AS hi
  FROM span)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(date_diff('day', lo, hi) + 1 AS BIGINT) AS window_days,
       ROUND(n_orders / CAST(date_diff('day', lo, hi) + 1 AS DOUBLE), 6)
         AS lambda_per_day,
       ROUND(CAST(order_days AS DOUBLE) / n_orders, 6) AS w_days,
       ROUND(CAST(order_days AS DOUBLE)
             / (date_diff('day', lo, hi) + 1), 6) AS l_in_system,
       ROUND((CAST(order_days AS DOUBLE) / (date_diff('day', lo, hi) + 1))
             / ((n_orders / CAST(date_diff('day', lo, hi) + 1 AS DOUBLE))
                * (CAST(order_days AS DOUBLE) / n_orders)), 6)
         AS littles_ratio
FROM m
"""

QUERIES["q_littles_law"] = QuerySpec(
    q_littles_law,
    Q_LITTLE_SQL,
    "Little's law ledger over the order lifecycle (lambda, W, L and "
    "the identity ratio) — the flow-consistency check",
)


# --------------------------------- newsvendor critical fractile
# Optimal stocking quantity = the cu/(cu+co) quantile of daily demand
# (cu = underage 3, co = overage 1 -> the 0.75 fractile), per part
# brand on daily quantity. Exact percentile over the daily demand
# curve per brand.

_CU, _CO = 3.0, 1.0


def q_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", F.col("l_quantity").cast("long").alias("qty")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    daily = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand", "l_shipdate")
        .agg(F.sum("qty").alias("d"))
    )
    frac = _CU / (_CU + _CO)
    return (
        daily.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.avg(F.col("d").cast("decimal(18,0)")).cast("double"), 4)
            .alias("mean_daily_demand"),
            F.round(F.percentile("d", frac), 4).alias("newsvendor_qty"),
        )
        .orderBy("p_brand")
    )


Q_NEWSV_SQL = f"""
WITH daily AS (
  SELECT p.p_brand, l.l_shipdate, SUM(CAST(l.l_quantity AS BIGINT)) AS d
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand, l.l_shipdate)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(AVG(CAST(d AS DECIMAL(18,0))) AS DOUBLE), 4)
         AS mean_daily_demand,
       ROUND(quantile_cont(d, {_CU / (_CU + _CO)}), 4) AS newsvendor_qty
FROM daily
GROUP BY p_brand
ORDER BY p_brand
"""

QUERIES["q_newsvendor_quantile"] = QuerySpec(
    q_newsvendor_quantile,
    Q_NEWSV_SQL,
    "newsvendor critical-fractile stocking quantity per brand (0.75 "
    "quantile of daily demand, exact percentiles)",
)


# ------------------------------------------ EOQ per part type
# EOQ = sqrt(2 D S / H) with annualized demand D from the fixture
# window, pinned ordering cost S=100 and holding cost H=2. One
# rollup + closed form; the classic inventory sizing readout.

_S_COST, _H_COST = 100.0, 2.0


def q_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", F.col("l_quantity").cast("long").alias("qty")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    j = li.join(F.broadcast(part), "l_partkey")
    bounds = j.agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    )
    per = j.groupBy("p_type").agg(F.sum("qty").alias("demand"))
    wdays = (F.datediff(F.col("hi"), F.col("lo")) + 1).cast("double")
    annual = F.col("demand") * 365.25 / wdays
    eoq = F.sqrt(2.0 * annual * F.lit(_S_COST) / F.lit(_H_COST))
    out = per.crossJoin(F.broadcast(bounds)).select(
        "p_type",
        F.col("demand").cast("long").alias("window_demand"),
        F.round(annual, 4).alias("annualized_demand"),
        F.round(eoq, 4).alias("eoq"),
    )
    return out.orderBy(F.col("eoq").desc(), "p_type").limit(10)


Q_EOQ_SQL = f"""
WITH j AS (
  SELECT p.p_type, l.l_shipdate, CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
bounds AS (SELECT MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi FROM j),
per AS (SELECT p_type, SUM(qty) AS demand FROM j GROUP BY p_type)
SELECT p_type,
       CAST(demand AS BIGINT) AS window_demand,
       ROUND(demand * 365.25
             / CAST(date_diff('day', lo, hi) + 1 AS DOUBLE), 4)
         AS annualized_demand,
       ROUND(SQRT(2.0 * (demand * 365.25
                  / CAST(date_diff('day', lo, hi) + 1 AS DOUBLE))
                  * {_S_COST} / {_H_COST}), 4) AS eoq
FROM per, bounds
ORDER BY eoq DESC, p_type
LIMIT 10
"""

QUERIES["q_eoq"] = QuerySpec(
    q_eoq,
    Q_EOQ_SQL,
    "EOQ economic order quantity per part type (annualized demand, "
    "closed form) — inventory sizing",
)

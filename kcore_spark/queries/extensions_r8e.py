"""Round-8 surface extensions, part E (SURVEY §2.3 N r8): leakage-safe
target encoding and the Lorenz revenue-concentration curve — the
feature-engineering + concentration-diagnostics block.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: integer/decimal domains wherever a
sum crosses rows; doubles only in per-row arithmetic or one final
division; orderings fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_rank

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------ target encoding
# Leave-one-out + smoothed target encoding of c_mktsegment against
# the "active customer" label (>= 10 orders) — the classic
# high-cardinality categorical feature for a tabular model, computed
# WITHOUT leakage: each row's own label is subtracted from its
# category aggregate (LOO), and the smoothed variant shrinks toward
# the global prior with m=10 pseudo-counts. Two partial-agg shuffles
# (per-category, global) + one broadcast join back; all sums integer.

TE_SMOOTHING_M = 10
TE_ACTIVE_MIN_ORDERS = 10


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    labeled = cust.join(
        orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_ord")),
        cust.c_custkey == F.col("o_custkey"),
        "left",
    ).select(
        "c_custkey",
        "c_mktsegment",
        (F.coalesce(F.col("n_ord"), F.lit(0)) >= TE_ACTIVE_MIN_ORDERS)
        .cast("int")
        .alias("y"),
    )
    per_seg = labeled.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_seg"), F.sum("y").cast("long").alias("s_seg")
    )
    glob = labeled.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("y").cast("long").alias("s_all")
    )
    return (
        labeled.join(F.broadcast(per_seg), "c_mktsegment")
        .crossJoin(F.broadcast(glob))
        .select(
            "c_custkey",
            "c_mktsegment",
            "y",
            F.round(
                (F.col("s_seg") - F.col("y")).cast("double")
                / (F.col("n_seg") - 1).cast("double"),
                8,
            ).alias("te_loo"),
            F.round(
                (
                    F.col("s_seg").cast("double")
                    + F.lit(float(TE_SMOOTHING_M))
                    * (F.col("s_all").cast("double") / F.col("n_all").cast("double"))
                )
                / (F.col("n_seg") + TE_SMOOTHING_M).cast("double"),
                8,
            ).alias("te_smooth"),
        )
        .orderBy("c_custkey")
    )


Q_TARGET_ENCODING_SQL = f"""
WITH labeled AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CASE WHEN COALESCE(o.n_ord, 0) >= {TE_ACTIVE_MIN_ORDERS} THEN 1 ELSE 0 END AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY o_custkey) o
    ON c.c_custkey = o.o_custkey),
per_seg AS (
  SELECT c_mktsegment, COUNT(*) AS n_seg, CAST(SUM(y) AS BIGINT) AS s_seg
  FROM labeled GROUP BY c_mktsegment),
gtot AS (SELECT COUNT(*) AS n_all, CAST(SUM(y) AS BIGINT) AS s_all FROM labeled)
SELECT l.c_custkey, l.c_mktsegment, l.y,
       ROUND(CAST(s_seg - y AS DOUBLE) / CAST(n_seg - 1 AS DOUBLE), 8) AS te_loo,
       ROUND((CAST(s_seg AS DOUBLE)
              + {TE_SMOOTHING_M}.0 * (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
             / CAST(n_seg + {TE_SMOOTHING_M} AS DOUBLE), 8) AS te_smooth
FROM labeled l JOIN per_seg USING (c_mktsegment) CROSS JOIN gtot
ORDER BY l.c_custkey
"""

QUERIES["q_target_encoding"] = QuerySpec(
    q_target_encoding,
    Q_TARGET_ENCODING_SQL,
    "leakage-safe LOO + smoothed target encoding of market segment vs customer activity",
)


# -------------------------------------------------- Lorenz curve
# Revenue-concentration diagnostics: customers ranked by total spend
# (exact distributed rank, ascending), cut into deciles with NTILE's
# exact fill semantics (the r7 WOE / r8 lift machinery), and the
# Lorenz curve reported as each decile's cumulative share of total
# revenue — plus the trapezoid Gini those shares imply. Revenue is
# summed in integer CENTS so every cumulative share is a ratio of
# exact integers; doubles appear only in the 10 output divisions.

LORENZ_BINS = 10


def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    n = spend.count()
    ranked = _dist_rank(spend, [F.col("cents"), F.col("o_custkey")])
    q, r = divmod(n, LORENZ_BINS)
    binned = ranked.select(
        (
            F.when(F.col("rk") <= r * (q + 1), (F.col("rk") - 1) / (q + 1))
            .otherwise(r + (F.col("rk") - r * (q + 1) - 1) / q)
            .cast("long")
            + 1
        ).alias("decile"),
        "cents",
    )
    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("cents")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("cum_cents", F.sum("cents").over(wcum))
        .crossJoin(F.broadcast(per.agg(F.sum("cents").alias("total"))))
        .select(
            "decile",
            "n_cust",
            F.round(F.col("cents").cast("double") / F.col("total").cast("double"), 8).alias(
                "share"
            ),
            F.round(
                F.col("cum_cents").cast("double") / F.col("total").cast("double"), 8
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


Q_LORENZ_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT NTILE({LORENZ_BINS}) OVER (ORDER BY cents ASC, o_custkey ASC) AS decile, cents
  FROM spend),
per AS (
  SELECT decile, COUNT(*) AS n_cust, SUM(cents) AS cents
  FROM ranked GROUP BY decile),
tot AS (SELECT SUM(cents) AS total FROM per)
SELECT decile, n_cust,
       ROUND(CAST(cents AS DOUBLE) / CAST(total AS DOUBLE), 8) AS share,
       ROUND(CAST(SUM(cents) OVER (ORDER BY decile) AS DOUBLE) / CAST(total AS DOUBLE), 8) AS cum_share
FROM per CROSS JOIN tot
ORDER BY decile
"""

QUERIES["q_lorenz_curve"] = QuerySpec(
    q_lorenz_curve,
    Q_LORENZ_SQL,
    "Lorenz revenue-concentration curve by customer decile (exact integer cents)",
)

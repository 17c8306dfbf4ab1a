"""Round-9 surface extensions, batch AF (SURVEY §2.3 N r9): grouped
quantile bands (the P10/P50/P90 fan-chart table per segment — the BI
uncertainty display q_percentiles computes only globally) and the
Poisson goodness-of-fit test on order basket sizes (the DISTRIBUTION-
fit complement to q_jarque_bera's normality: is arrival-like data
actually Poisson?).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Factorials enter as shared literals so both engines evaluate the same
Poisson mass; cells stay integers until the χ² terms.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- grouped quantile bands (fan chart)
# P10/P50/P90 of order value per market segment: the per-group
# uncertainty band every revenue fan chart plots. Exact percentiles
# (interpolated) per group — one partial-agg pass; the group count
# bounds the output.


def q_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.expr("percentile(o_totalprice, 0.1)"), 6).alias("p10"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        )
        .orderBy("segment")
    )


Q_BANDS_SQL = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(o_totalprice, 0.1), 6) AS p10,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY segment
"""

QUERIES["q_quantile_bands"] = QuerySpec(
    q_quantile_bands,
    Q_BANDS_SQL,
    "grouped quantile bands: exact P10/P50/P90 of order value per "
    "market segment — the fan-chart table, one partial-agg pass",
)


# -------------------------- Poisson goodness-of-fit (basket sizes)
# Basket size = lineitems per order; H0: size−1 ~ Poisson(λ̂) with
# λ̂ = mean−1 (sizes start at 1). χ² over cells k ∈ [0, 8] plus a
# tail bucket; expected mass uses literal factorials so both engines
# compute identical Poisson terms (no lgamma dependency). λ̂ is
# rounded to 6 before the mass so the reference distribution is
# pinned, not a float race.

_POIS_K = 8
_FACT = [math.factorial(k) for k in range(_POIS_K + 1)]


def q_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    sizes = li.groupBy("l_orderkey").agg((F.count(F.lit(1)) - 1).alias("k"))
    lam = sizes.agg(F.round(F.avg("k"), 6).alias("lam"))
    cells = sizes.groupBy(
        F.least(F.col("k"), F.lit(_POIS_K)).alias("cell")
    ).agg(F.count(F.lit(1)).alias("obs"))
    tot = sizes.agg(F.count(F.lit(1)).alias("n"))
    # expected mass per cell from the pinned λ̂ (tail cell = remainder)
    c = cells.crossJoin(F.broadcast(lam)).crossJoin(F.broadcast(tot))
    mass_terms = [
        F.when(
            F.col("cell") == k,
            F.exp(-F.col("lam")) * F.pow(F.col("lam"), float(k)) / float(_FACT[k]),
        )
        for k in range(_POIS_K)
    ]
    below_tail = None
    for k in range(_POIS_K):
        t = F.exp(-F.col("lam")) * F.pow(F.col("lam"), float(k)) / float(_FACT[k])
        below_tail = t if below_tail is None else below_tail + t
    mass = F.coalesce(*mass_terms, F.lit(1.0) - below_tail)
    terms = c.select(
        "cell",
        F.col("obs").cast("long").alias("obs"),
        (F.col("n") * mass).alias("exp_n"),
    )
    return (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.round(
                F.sum(
                    (F.col("obs") - F.col("exp_n"))
                    * (F.col("obs") - F.col("exp_n"))
                    / F.nullif(F.col("exp_n"), F.lit(0.0))
                ),
                4,
            ).alias("chi2_gof"),
        )
    )


def _pois_sql() -> str:
    mass_cases = " ".join(
        f"WHEN cell = {k} THEN EXP(-lam) * POW(lam, {k}) / {_FACT[k]}.0"
        for k in range(_POIS_K)
    )
    below = " + ".join(
        f"EXP(-lam) * POW(lam, {k}) / {_FACT[k]}.0" for k in range(_POIS_K)
    )
    return f"""
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) - 1 AS k FROM lineitem GROUP BY l_orderkey),
lam AS (SELECT ROUND(AVG(k), 6) AS lam FROM sizes),
tot AS (SELECT COUNT(*) AS n FROM sizes),
cells AS (
  SELECT LEAST(k, {_POIS_K}) AS cell, COUNT(*) AS obs FROM sizes GROUP BY 1),
terms AS (
  SELECT cell, obs,
         n * (CASE {mass_cases} ELSE 1.0 - ({below}) END) AS exp_n
  FROM cells CROSS JOIN lam CROSS JOIN tot)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(SUM((obs - exp_n) * (obs - exp_n) / NULLIF(exp_n, 0.0)), 4) AS chi2_gof
FROM terms
"""


QUERIES["q_poisson_gof"] = QuerySpec(
    q_poisson_gof,
    _pois_sql(),
    "Poisson goodness-of-fit of basket sizes: χ² over 9+tail cells "
    "against the pinned-λ̂ mass (literal factorials, no lgamma)",
)

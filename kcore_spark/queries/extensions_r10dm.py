"""Round-10 surface extensions, batch DM (SURVEY §2.3 N r10): the
network-robustness block over the part co-purchase graph (parts
sharing an order are linked) — targeted-vs-random attack (remove the
top-1% hubs vs a hashed random 1% and compare surviving edges: the
scale-free-fragility demonstration), the hub-attack sweep (edge
survival and newly-isolated nodes at 1/5/10% removal), and the
Molloy-Reed percolation threshold (f_c = 1 - 1/(kappa - 1) with
kappa = <k^2>/<k> from the degree distribution — the THEORY number the
sweep should collapse near). Completes the graph family next to
q_degree_ccdf / q_rich_club / q_kcore_subgraph.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: edges/degrees are exact integers; hub picks are fully
tie-broken TakeOrdered lists; the random set is md5-pinned; all
survival counts integer.
Scale: per-order pair fan-out is basket-bounded (the q_basket_pmi
shape); attacks are semi/anti joins against k-row or hashed removal
sets — no iteration, no CC.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _r6(x: float) -> float:
    """Half-up 6dp rounding (matches SQL ROUND for positives —
    Python's round() is half-even)."""
    return math.floor(x * 1e6 + 0.5) / 1e6

_SWEEP = [1, 5, 10]  # removal percents


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, (a.o == b.o2) & (F.col("pa") < F.col("pb")))
        .select("pa", "pb")
        .distinct()
    )


_EDGES_SQL = """
  edges AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("pa").alias("p"))
        .unionByName(edges.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


_DEG_SQL = """
  degs AS (
    SELECT p, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      SELECT pa AS p FROM edges UNION ALL SELECT pb AS p FROM edges)
    GROUP BY p)
"""


def q_attack_edge_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).localCheckpoint()
    degs = _degrees(edges)
    n_nodes = degs.count()
    k = max(1, n_nodes // 100)
    hubs = (
        degs.orderBy(F.col("deg").desc(), "p").limit(k).select("p")
    )
    rnd = degs.where(
        F.conv(F.substring(F.md5(F.concat(F.lit("atk-"), F.col("p").cast("string"))), 1, 8), 16, 10)
        % 100
        < 1
    ).select("p")

    def survival(removed: DataFrame, tag: str) -> DataFrame:
        rset = removed.select(F.col("p").alias("rp"))
        surv = (
            edges.join(rset, edges.pa == rset.rp, "left_anti")
            .join(rset, edges.pb == rset.rp, "left_anti")
            .count()
        )
        total = edges.count()
        nrem = removed.count()
        return spark.createDataFrame(
            [(tag, nrem, total, surv, _r6(surv / total))],
            ["strategy", "n_removed", "edges_total", "edges_surviving", "survival"],
        )

    return survival(hubs, "hub_1pct").unionByName(
        survival(rnd, "random_1pct")
    ).orderBy("strategy")


Q_ATTACK_SQL = f"""
WITH {_EDGES_SQL},
{_DEG_SQL},
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM degs),
hubs AS (
  SELECT p FROM degs CROSS JOIN nn
  QUALIFY ROW_NUMBER() OVER (ORDER BY deg DESC, p) <= GREATEST(1, n // 100)),
rnd AS (
  SELECT p FROM degs
  WHERE ('0x' || substring(md5('atk-' || CAST(p AS VARCHAR)), 1, 8))::BIGINT
        % 100 < 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS edges_total FROM edges),
hub_s AS (
  SELECT 'hub_1pct' AS strategy,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM hubs) AS n_removed,
         CAST(COUNT(*) AS BIGINT) AS edges_surviving
  FROM edges
  WHERE pa NOT IN (SELECT p FROM hubs) AND pb NOT IN (SELECT p FROM hubs)),
rnd_s AS (
  SELECT 'random_1pct' AS strategy,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM rnd) AS n_removed,
         CAST(COUNT(*) AS BIGINT) AS edges_surviving
  FROM edges
  WHERE pa NOT IN (SELECT p FROM rnd) AND pb NOT IN (SELECT p FROM rnd))
SELECT strategy, n_removed, edges_total, edges_surviving,
       ROUND(edges_surviving / CAST(edges_total AS DOUBLE), 6) AS survival
FROM (SELECT * FROM hub_s UNION ALL SELECT * FROM rnd_s) u
CROSS JOIN tot
ORDER BY strategy
"""

QUERIES["q_attack_edge_survival"] = QuerySpec(
    q_attack_edge_survival,
    Q_ATTACK_SQL,
    "targeted (top-1% hubs) vs random 1% node removal: surviving "
    "co-purchase edges — anti-joins, no iteration",
)


def q_attack_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).localCheckpoint()
    degs = _degrees(edges).localCheckpoint()
    n_nodes = degs.count()
    total = edges.count()
    rows = []
    for pct in _SWEEP:
        k = max(1, n_nodes * pct // 100)
        hubs = degs.orderBy(F.col("deg").desc(), "p").limit(k).select(
            F.col("p").alias("rp")
        )
        surv = (
            edges.join(hubs, edges.pa == hubs.rp, "left_anti")
            .join(hubs, edges.pb == hubs.rp, "left_anti")
            .count()
        )
        rows.append((pct, k, surv, _r6(surv / total)))
    return spark.createDataFrame(
        rows, ["removal_pct", "n_removed", "edges_surviving", "survival"]
    ).orderBy("removal_pct")


def _sweep_arm_sql(pct: int) -> str:
    return f"""
  SELECT {pct} AS removal_pct,
         (SELECT CAST(GREATEST(1, n * {pct} // 100) AS BIGINT) FROM nn)
             AS n_removed,
         CAST(COUNT(*) AS BIGINT) AS edges_surviving
  FROM edges
  WHERE pa NOT IN (SELECT p FROM degs CROSS JOIN nn
                   QUALIFY ROW_NUMBER() OVER (ORDER BY deg DESC, p)
                           <= GREATEST(1, n * {pct} // 100))
    AND pb NOT IN (SELECT p FROM degs CROSS JOIN nn
                   QUALIFY ROW_NUMBER() OVER (ORDER BY deg DESC, p)
                           <= GREATEST(1, n * {pct} // 100))
"""


Q_SWEEP_SQL = f"""
WITH {_EDGES_SQL},
{_DEG_SQL},
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM degs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS edges_total FROM edges),
arms AS ({" UNION ALL ".join(_sweep_arm_sql(p) for p in _SWEEP)})
SELECT removal_pct, n_removed, edges_surviving,
       ROUND(edges_surviving / CAST(edges_total AS DOUBLE), 6) AS survival
FROM arms CROSS JOIN tot
ORDER BY removal_pct
"""

QUERIES["q_attack_sweep"] = QuerySpec(
    q_attack_sweep,
    Q_SWEEP_SQL,
    "hub-removal sweep at 1/5/10%: surviving-edge curve — k-row "
    "TakeOrdered hub sets, anti-joins",
)


def q_percolation_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    degs = _degrees(edges)
    agg = degs.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("deg").cast("long").alias("s1"),
        F.sum((F.col("deg") * F.col("deg")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2"),
    )
    nd = F.col("n_nodes").cast("double")
    k1 = F.col("s1").cast("double") / nd
    k2 = F.col("s2") / nd
    kappa = k2 / k1
    fc = 1.0 - 1.0 / (kappa - 1.0)
    return agg.select(
        "n_nodes",
        F.round(k1, 4).alias("mean_degree"),
        F.round(kappa, 4).alias("kappa"),
        F.round(fc, 6).alias("percolation_threshold"),
    )


Q_PERC_SQL = f"""
WITH {_EDGES_SQL},
{_DEG_SQL},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(deg) AS BIGINT) AS s1,
         CAST(SUM(CAST(deg * deg AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM degs)
SELECT n_nodes,
       ROUND(CAST(s1 AS DOUBLE) / n_nodes, 4) AS mean_degree,
       ROUND((s2 / n_nodes) / (CAST(s1 AS DOUBLE) / n_nodes), 4) AS kappa,
       ROUND(1.0 - 1.0 / ((s2 / n_nodes) / (CAST(s1 AS DOUBLE) / n_nodes)
                          - 1.0), 6) AS percolation_threshold
FROM agg
"""

QUERIES["q_percolation_threshold"] = QuerySpec(
    q_percolation_threshold,
    Q_PERC_SQL,
    "Molloy-Reed percolation threshold from the degree distribution — "
    "kappa = <k^2>/<k>, one degree fold",
)

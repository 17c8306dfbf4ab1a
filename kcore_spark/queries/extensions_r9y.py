"""Round-9 surface extensions, batch Y (SURVEY §2.3 N r9): Bradley-
Terry preference learning run in-engine — the pairwise-comparison
strength model behind reward-model data curation and ranking-eval
(who beats whom → latent strengths). Comparisons are derived
deterministically from the fixture (within each order, the two lowest
line numbers fight; higher extended price wins; contenders are the 8
supplier classes), and the MLE is three unrolled gradient-ascent
rounds over an 8-row broadcast parameter vector — the q_logreg_gd
iterate discipline applied to a pairwise objective, ROUND(·,9)
between rounds for cross-engine trajectory pinning.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_BT_ROUNDS = 3
_BT_LR = 0.5
_BT_K = 8


def _bt_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    two = li.where(F.col("l_linenumber") <= 2)
    a = two.where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        (F.col("l_suppkey") % _BT_K).alias("ia"),
        F.col("l_extendedprice").alias("pa"),
    )
    b = two.where(F.col("l_linenumber") == 2).select(
        "l_orderkey",
        (F.col("l_suppkey") % _BT_K).alias("ib"),
        F.col("l_extendedprice").alias("pb"),
    )
    return (
        a.join(b, "l_orderkey")
        .where(F.col("ia") != F.col("ib"))  # self-play teaches nothing
        .select(
            "ia", "ib", (F.col("pa") > F.col("pb")).cast("double").alias("win_a")
        )
    )


def _bt_round(pairs: DataFrame, theta: DataFrame) -> DataFrame:
    """One gradient-ascent round: g_i = Σ over i's comparisons of
    (win − σ(θ_i − θ_opp)); θ' = ROUND(θ + lr·g/n_i, 9)."""
    ta = theta.select(F.col("i").alias("ia"), F.col("th").alias("tha"))
    tb = theta.select(F.col("i").alias("ib"), F.col("th").alias("thb"))
    scored = (
        pairs.join(F.broadcast(ta), "ia")
        .join(F.broadcast(tb), "ib")
        .withColumn(
            "resid",
            F.col("win_a")
            - 1.0 / (1.0 + F.exp(-(F.col("tha") - F.col("thb")))),
        )
    )
    ga = scored.groupBy(F.col("ia").alias("i")).agg(
        F.sum("resid").alias("g"), F.count(F.lit(1)).alias("n")
    )
    gb = scored.groupBy(F.col("ib").alias("i")).agg(
        F.sum(-F.col("resid")).alias("g"), F.count(F.lit(1)).alias("n")
    )
    g = (
        ga.unionByName(gb)
        .groupBy("i")
        .agg(F.sum("g").alias("g"), F.sum("n").alias("n"))
    )
    return theta.join(g, "i", "left").select(
        "i",
        F.round(
            F.col("th")
            + F.lit(_BT_LR) * F.coalesce(F.col("g") / F.col("n"), F.lit(0.0)),
            9,
        ).alias("th"),
    )


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _bt_pairs(spark, sf_dir).localCheckpoint()
    theta = spark.range(_BT_K).select(
        F.col("id").alias("i"), F.lit(0.0).alias("th")
    )
    for _ in range(_BT_ROUNDS):
        theta = _bt_round(pairs, theta).localCheckpoint()
    n_cmp = (
        pairs.select(F.col("ia").alias("i"))
        .unionByName(pairs.select(F.col("ib").alias("i")))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("n_comparisons"))
    )
    return (
        theta.join(n_cmp, "i", "left")
        .na.fill({"n_comparisons": 0})
        .select(
            F.col("i").cast("long").alias("item"),
            F.round("th", 5).alias("strength"),
            F.col("n_comparisons").cast("long").alias("n_comparisons"),
        )
        .orderBy("item")
    )


def _bt_sql() -> str:
    cte = [
        f"""pairs AS (
  SELECT a.ia, b.ib, CASE WHEN a.pa > b.pb THEN 1.0 ELSE 0.0 END AS win_a
  FROM (SELECT l_orderkey, l_suppkey % {_BT_K} AS ia, l_extendedprice AS pa
        FROM lineitem WHERE l_linenumber = 1) a
  JOIN (SELECT l_orderkey, l_suppkey % {_BT_K} AS ib, l_extendedprice AS pb
        FROM lineitem WHERE l_linenumber = 2) b
    ON a.l_orderkey = b.l_orderkey
  WHERE a.ia <> b.ib)""",
        f"t0 AS (SELECT unnest(range({_BT_K})) AS i, 0.0 AS th)",
    ]
    for r in range(_BT_ROUNDS):
        cte.append(
            f"""s{r} AS (
  SELECT p.ia, p.ib,
         p.win_a - 1.0 / (1.0 + EXP(-(ta.th - tb.th))) AS resid
  FROM pairs p
  JOIN t{r} ta ON p.ia = ta.i
  JOIN t{r} tb ON p.ib = tb.i)""",
        )
        cte.append(
            f"""g{r} AS (
  SELECT i, SUM(g) AS g, SUM(n) AS n FROM (
    SELECT ia AS i, SUM(resid) AS g, COUNT(*) AS n FROM s{r} GROUP BY ia
    UNION ALL
    SELECT ib, SUM(-resid), COUNT(*) FROM s{r} GROUP BY ib)
  GROUP BY i)""",
        )
        cte.append(
            f"""t{r + 1} AS (
  SELECT t.i, ROUND(t.th + {_BT_LR} * COALESCE(g.g / g.n, 0.0), 9) AS th
  FROM t{r} t LEFT JOIN g{r} g ON t.i = g.i)""",
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f""",
n_cmp AS (
  SELECT i, COUNT(*) AS n_comparisons FROM (
    SELECT ia AS i FROM pairs UNION ALL SELECT ib FROM pairs)
  GROUP BY i)
SELECT CAST(t.i AS BIGINT) AS item, ROUND(t.th, 5) AS strength,
       CAST(COALESCE(n_cmp.n_comparisons, 0) AS BIGINT) AS n_comparisons
FROM t{_BT_ROUNDS} t LEFT JOIN n_cmp ON t.i = n_cmp.i
ORDER BY item
"""
    )


QUERIES["q_bradley_terry"] = QuerySpec(
    q_bradley_terry,
    _bt_sql(),
    "Bradley-Terry preference strengths from within-order supplier "
    "duels — three unrolled in-engine gradient rounds, ROUND(·,9) "
    "trajectory pinning, 8-row broadcast iterate",
)

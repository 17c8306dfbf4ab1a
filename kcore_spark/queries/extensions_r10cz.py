"""Round-10 surface extensions, batch CZ (SURVEY §2.3 N r10): the
incremental-view-maintenance block, second wave (next to
q_incremental_agg_maintenance / q_incremental_dedup) — delta-JOIN
maintenance (the bilinear identity: (R + dR) ⋈ S = R ⋈ S + dR ⋈ S,
maintained vs recomputed, equality PROVEN in the output), top-k
maintenance with a 2k keep-buffer (when does the buffered incremental
top-k equal the full recompute, and did the buffer's k-th bound
actually protect it?), and aggregate RETRACTION (deletes: maintain
sum/count/avg by subtracting the retracted month, verified against
recomputation — the half of IVM that insert-only designs skip).

Delta: the latest order month. All three report the maintained value,
the recomputed value, and the match flag — the query IS the test.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: cents-decimal sums; top-k fully tie-broken; match flags
compare DECIMAL-exact quantities.
Scale: deltas are month-partition-sized; the maintained plans touch
only base-aggregate state plus the delta (the point of IVM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_K = 10


def _split(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
    )
    mx = orders.agg(F.max("m").alias("mx"))
    tagged = orders.crossJoin(F.broadcast(mx))
    base = tagged.where(F.col("m") < F.col("mx"))
    delta = tagged.where(F.col("m") == F.col("mx"))
    return tagged, base, delta


_SPLIT_SQL = """
  o AS (
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS m
    FROM orders),
  mx AS (SELECT MAX(m) AS mx FROM o),
  tagged AS (SELECT o.*, mx FROM o CROSS JOIN mx),
  base AS (SELECT * FROM tagged WHERE m < mx),
  delta AS (SELECT * FROM tagged WHERE m = mx)
"""


def q_delta_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue of orders ⋈ customer: view over base + view
    over delta vs view over the full table — the bilinear identity."""
    tagged, base, delta = _split(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    def view(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.join(cust, df.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias(f"rev_{tag}"))
        )

    maintained = view(base, "base").join(
        view(delta, "delta"), "c_nationkey", "full_outer"
    ).select(
        "c_nationkey",
        (
            F.coalesce(F.col("rev_base"), F.lit(0).cast("decimal(38,0)"))
            + F.coalesce(F.col("rev_delta"), F.lit(0).cast("decimal(38,0)"))
        ).alias("rev_maintained"),
    )
    full = view(tagged, "full")
    j = maintained.join(full, "c_nationkey")
    return j.select(
        "c_nationkey",
        F.col("rev_maintained").cast("double").alias("rev_maintained"),
        F.col("rev_full").cast("double").alias("rev_recomputed"),
        (F.col("rev_maintained") == F.col("rev_full")).alias("matches"),
    ).orderBy("c_nationkey")


Q_DELTAJOIN_SQL = f"""
WITH {_SPLIT_SQL},
vb AS (
  SELECT c_nationkey, SUM(CAST(cents AS DECIMAL(38,0))) AS rev_base
  FROM base JOIN customer ON o_custkey = c_custkey GROUP BY 1),
vd AS (
  SELECT c_nationkey, SUM(CAST(cents AS DECIMAL(38,0))) AS rev_delta
  FROM delta JOIN customer ON o_custkey = c_custkey GROUP BY 1),
vf AS (
  SELECT c_nationkey, SUM(CAST(cents AS DECIMAL(38,0))) AS rev_full
  FROM tagged JOIN customer ON o_custkey = c_custkey GROUP BY 1),
maintained AS (
  SELECT COALESCE(vb.c_nationkey, vd.c_nationkey) AS c_nationkey,
         COALESCE(rev_base, 0) + COALESCE(rev_delta, 0) AS rev_maintained
  FROM vb FULL OUTER JOIN vd ON vb.c_nationkey = vd.c_nationkey)
SELECT m.c_nationkey AS c_nationkey,
       CAST(rev_maintained AS DOUBLE) AS rev_maintained,
       CAST(rev_full AS DOUBLE) AS rev_recomputed,
       rev_maintained = rev_full AS matches
FROM maintained m JOIN vf ON m.c_nationkey = vf.c_nationkey
ORDER BY c_nationkey
"""

QUERIES["q_delta_join_maintenance"] = QuerySpec(
    q_delta_join_maintenance,
    Q_DELTAJOIN_SQL,
    "delta-join IVM: base view + delta view vs full recompute per "
    "nation, equality proven in-row",
)


def q_topk_buffer_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the global top-10 orders by value with a 2k buffer of
    the base: union(buffer, delta) re-ranked vs the full recompute."""
    tagged, base, delta = _split(spark, sf_dir)

    def topn(df: DataFrame, n: int) -> DataFrame:
        return df.select("o_orderkey", "cents").orderBy(
            F.col("cents").desc(), "o_orderkey"
        ).limit(n)

    buffered = topn(base, 2 * _K).unionByName(delta.select("o_orderkey", "cents"))
    maintained = topn(buffered, _K).select(
        "o_orderkey", F.col("cents").alias("cents_m")
    )
    full = topn(tagged, _K).select(
        F.col("o_orderkey").alias("ok2"), F.col("cents").alias("cents_f")
    )
    j = maintained.join(full, maintained.o_orderkey == full.ok2, "full_outer")
    return j.agg(
        F.sum(
            (F.col("o_orderkey").isNotNull() & F.col("ok2").isNotNull()).cast(
                "long"
            )
        ).alias("overlap"),
        F.count(F.lit(1)).cast("long").alias("union_size"),
        (
            F.sum(
                (F.col("o_orderkey").isNotNull() & F.col("ok2").isNotNull()).cast(
                    "long"
                )
            )
            == _K
        ).alias("buffer_sufficient"),
    )


Q_TOPK_SQL = f"""
WITH {_SPLIT_SQL},
buffered AS (
  SELECT o_orderkey, cents FROM (
    SELECT o_orderkey, cents FROM base
    ORDER BY cents DESC, o_orderkey LIMIT {2 * _K})
  UNION ALL
  SELECT o_orderkey, cents FROM delta),
maintained AS (
  SELECT o_orderkey, cents FROM buffered
  ORDER BY cents DESC, o_orderkey LIMIT {_K}),
full_t AS (
  SELECT o_orderkey AS ok2, cents FROM tagged
  ORDER BY cents DESC, o_orderkey LIMIT {_K})
SELECT CAST(SUM(CASE WHEN maintained.o_orderkey IS NOT NULL
                      AND ok2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS overlap,
       CAST(COUNT(*) AS BIGINT) AS union_size,
       SUM(CASE WHEN maintained.o_orderkey IS NOT NULL AND ok2 IS NOT NULL
                THEN 1 ELSE 0 END) = {_K} AS buffer_sufficient
FROM maintained FULL OUTER JOIN full_t ON maintained.o_orderkey = full_t.ok2
"""

QUERIES["q_topk_buffer_maintenance"] = QuerySpec(
    q_topk_buffer_maintenance,
    Q_TOPK_SQL,
    "incremental top-10 with a 2k keep-buffer vs full recompute — "
    "overlap and sufficiency proven",
)


def q_agg_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletes: retract the latest month from (count, sum) state and
    verify count/sum/avg against recomputation over the remainder."""
    tagged, base, delta = _split(spark, sf_dir)

    def state(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias(f"s_{tag}"),
        )

    j = (
        state(tagged, "full")
        .crossJoin(F.broadcast(state(delta, "delta")))
        .crossJoin(F.broadcast(state(base, "base")))
    )
    n_m = F.col("n_full") - F.col("n_delta")
    s_m = F.col("s_full") - F.col("s_delta")
    return j.select(
        n_m.alias("n_maintained"),
        F.col("n_base").alias("n_recomputed"),
        s_m.cast("double").alias("sum_maintained"),
        F.col("s_base").cast("double").alias("sum_recomputed"),
        F.round(s_m.cast("double") / n_m.cast("double") / 100.0, 6).alias(
            "avg_maintained"
        ),
        F.round(
            F.col("s_base").cast("double")
            / F.col("n_base").cast("double")
            / 100.0,
            6,
        ).alias("avg_recomputed"),
        ((n_m == F.col("n_base")) & (s_m == F.col("s_base"))).alias("matches"),
    )


Q_RETRACT_SQL = f"""
WITH {_SPLIT_SQL},
sf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_full,
              SUM(CAST(cents AS DECIMAL(38,0))) AS s_full FROM tagged),
sd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_delta,
              SUM(CAST(cents AS DECIMAL(38,0))) AS s_delta FROM delta),
sb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
              SUM(CAST(cents AS DECIMAL(38,0))) AS s_base FROM base)
SELECT n_full - n_delta AS n_maintained,
       n_base AS n_recomputed,
       CAST(s_full - s_delta AS DOUBLE) AS sum_maintained,
       CAST(s_base AS DOUBLE) AS sum_recomputed,
       ROUND(CAST(s_full - s_delta AS DOUBLE)
             / CAST(n_full - n_delta AS DOUBLE) / 100.0, 6) AS avg_maintained,
       ROUND(CAST(s_base AS DOUBLE) / CAST(n_base AS DOUBLE) / 100.0, 6)
           AS avg_recomputed,
       (n_full - n_delta = n_base AND s_full - s_delta = s_base) AS matches
FROM sf CROSS JOIN sd CROSS JOIN sb
"""

QUERIES["q_agg_retraction"] = QuerySpec(
    q_agg_retraction,
    Q_RETRACT_SQL,
    "aggregate retraction IVM: subtract the deleted month from "
    "count/sum state vs recompute — exact decimal equality",
)

"""Round-10 surface extensions, batch CC (SURVEY §2.3 N r10): the
data-placement block — the partitioner's toolkit the physical-design
advisors (q_partition_balance / q_skew_salting_plan) stop short of.
Consistent-hash ring placement (8 nodes x 32 vnodes: how even is the
key spread?), rendezvous/HRW hashing (argmax placement, plus the
minimal-movement property measured under a node REMOVAL), and ring
rebalance (movement fraction when a 9th node joins the ring — theory
says ~1/9 of keys move, the measurement says what the vnode count
actually delivers).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: placements are pure md5 arithmetic (same digest both
engines); ring lookup is an in-array successor scan over the SORTED
256/288-point ring aggregated to ONE row (no per-key join explosion);
all outputs are integer counts and exact shares.
Scale: one scan per query; the ring rides along as a broadcast 1-row
array; per-key work is an O(vnodes) JVM array filter (constant), so
the plan is embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_NODES = [f"n{i}" for i in range(8)]
_VNODES = 32
_REMOVED = "n3"
_ADDED = "n8"


def _h32(col: Column) -> Column:
    """First 8 md5 hex digits as a BIGINT — the shared 32-bit hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _ring(spark: SparkSession, nodes: list[str]) -> DataFrame:
    """One row: the sorted ring as parallel arrays (hashes, node tags)."""
    pts = (
        spark.createDataFrame([(n,) for n in nodes], ["node"])
        .select(
            "node",
            F.explode(F.sequence(F.lit(0), F.lit(_VNODES - 1))).alias("v"),
        )
        .select(
            "node",
            _h32(
                F.concat(F.col("node"), F.lit("#"), F.col("v").cast("string"))
            ).alias("rh"),
        )
    )
    return pts.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rh"), F.col("node")))
        ).alias("ring")
    )


def _ring_sql(nodes: list[str]) -> str:
    lst = ", ".join(f"'{n}'" for n in nodes)
    return f"""
    SELECT LIST_SORT(LIST({{'rh': rh, 'node': node}})) AS ring FROM (
      SELECT node,
             ('0x' || substring(md5(node || '#' || v), 1, 8))::BIGINT AS rh
      FROM (SELECT UNNEST([{lst}]) AS node)
      CROSS JOIN (SELECT UNNEST(generate_series(0, {_VNODES - 1})) AS v))
  """


def _assign(ring_col: Column, kh: Column) -> Column:
    """Successor vnode on the ring (wrap to the ring minimum)."""
    succ = F.filter(ring_col, lambda s: s["rh"] >= kh)
    return F.when(F.size(succ) > 0, F.element_at(succ, 1)["node"]).otherwise(
        F.element_at(ring_col, 1)["node"]
    )


_ASSIGN_SQL = (
    "COALESCE(list_filter({ring}, s -> s.rh >= {kh})[1].node, {ring}[1].node)"
)
_KH_SQL = "('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT"


def q_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .withColumn("kh", _h32(F.col("c_custkey").cast("string")))
    )
    ring = _ring(spark, _NODES)
    placed = keys.crossJoin(F.broadcast(ring)).select(
        _assign(F.col("ring"), F.col("kh")).alias("node")
    )
    tot = placed.count()
    per = placed.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    return per.select(
        "node",
        "n_keys",
        F.round(F.col("n_keys") / F.lit(float(tot)), 6).alias("share"),
    ).orderBy("node")


Q_RING_SQL = f"""
WITH ring_t AS ({_ring_sql(_NODES)}),
placed AS (
  SELECT {_ASSIGN_SQL.format(ring="ring", kh=_KH_SQL)} AS node
  FROM customer CROSS JOIN ring_t),
tot AS (SELECT COUNT(*) AS t FROM placed)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_keys,
       ROUND(COUNT(*) / CAST(MIN(t) AS DOUBLE), 6) AS share
FROM placed CROSS JOIN tot GROUP BY node ORDER BY node
"""

QUERIES["q_consistent_hash_ring"] = QuerySpec(
    q_consistent_hash_ring,
    Q_RING_SQL,
    "consistent-hash ring placement (8 nodes x 32 vnodes) of customers "
    "— broadcast 1-row sorted ring, O(vnodes) successor scan per key",
)


# ------------------------------------------------ rendezvous hashing
# node = argmax_n md5(node || key); removing a node moves ONLY its keys.


def q_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    nodes = F.array(*[F.lit(n) for n in _NODES])
    scored = keys.select(
        "c_custkey",
        F.explode(nodes).alias("node"),
    ).select(
        "c_custkey",
        "node",
        # weight made collision-proof: 32-bit hash composed with the
        # node index (ties in the raw hash would be engine-unpinned)
        (
            _h32(
                F.concat(
                    F.col("node"), F.lit("@"), F.col("c_custkey").cast("string")
                )
            )
            * 16
            + F.substring(F.col("node"), 2, 9).cast("long")
        ).alias("w"),
    )
    best = scored.groupBy("c_custkey").agg(
        F.max(F.struct(F.col("w"), F.col("node"))).alias("b"),
        F.max(
            F.when(
                F.col("node") != _REMOVED, F.struct(F.col("w"), F.col("node"))
            )
        ).alias("b2"),
    )
    placed = best.select(
        F.col("b.node").alias("node"), F.col("b2.node").alias("node_after")
    )
    return (
        placed.groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum((F.col("node") != F.col("node_after")).cast("long")).alias(
                "n_moved_away"
            ),
        )
        .orderBy("node")
    )


Q_HRW_SQL = f"""
WITH scored AS (
  SELECT c_custkey, node,
         ('0x' || substring(md5(node || '@' || CAST(c_custkey AS VARCHAR)),
                            1, 8))::BIGINT * 16
           + CAST(substring(node, 2, 9) AS BIGINT) AS w
  FROM customer
  CROSS JOIN (SELECT UNNEST([{", ".join(f"'{n}'" for n in _NODES)}]) AS node)),
best AS (
  SELECT c_custkey,
         ARG_MAX(node, w) AS node,
         ARG_MAX(CASE WHEN node <> '{_REMOVED}' THEN node END,
                 CASE WHEN node <> '{_REMOVED}' THEN w END) AS node_after
  FROM scored GROUP BY c_custkey)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN node <> node_after THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved_away
FROM best GROUP BY node ORDER BY node
"""

QUERIES["q_rendezvous_hashing"] = QuerySpec(
    q_rendezvous_hashing,
    Q_HRW_SQL,
    "rendezvous (HRW) placement of customers over 8 nodes + the "
    "minimal-movement property under removing one node — argmax fold",
)


# --------------------------------------------------- ring rebalance
# Movement fraction when node n8 joins the 8-node ring.


def q_ring_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .withColumn("kh", _h32(F.col("c_custkey").cast("string")))
    )
    before = _ring(spark, _NODES).select(F.col("ring").alias("ring_a"))
    after = _ring(spark, _NODES + [_ADDED]).select(F.col("ring").alias("ring_b"))
    placed = (
        keys.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            _assign(F.col("ring_a"), F.col("kh")).alias("n_a"),
            _assign(F.col("ring_b"), F.col("kh")).alias("n_b"),
        )
    )
    agg = placed.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum((F.col("n_a") != F.col("n_b")).cast("long")).alias("n_moved"),
        F.sum((F.col("n_b") == _ADDED).cast("long")).alias("n_to_new"),
    )
    return agg.select(
        "n_keys",
        "n_moved",
        "n_to_new",
        F.round(F.col("n_moved") / F.col("n_keys").cast("double"), 6).alias(
            "moved_frac"
        ),
        # every moved key must land on the NEW node (ring invariant)
        (F.col("n_moved") == F.col("n_to_new")).alias("only_moves_to_new"),
    )


Q_REBAL_SQL = f"""
WITH ring_a_t AS ({_ring_sql(_NODES)}),
ring_b_t AS ({_ring_sql(_NODES + [_ADDED])}),
placed AS (
  SELECT {_ASSIGN_SQL.format(ring="ring_a", kh=_KH_SQL)} AS n_a,
         {_ASSIGN_SQL.format(ring="ring_b", kh=_KH_SQL)} AS n_b
  FROM customer
  CROSS JOIN (SELECT ring AS ring_a FROM ring_a_t)
  CROSS JOIN (SELECT ring AS ring_b FROM ring_b_t))
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN n_a <> n_b THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       CAST(SUM(CASE WHEN n_b = '{_ADDED}' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_to_new,
       ROUND(SUM(CASE WHEN n_a <> n_b THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS moved_frac,
       SUM(CASE WHEN n_a <> n_b THEN 1 ELSE 0 END)
         = SUM(CASE WHEN n_b = '{_ADDED}' THEN 1 ELSE 0 END)
           AS only_moves_to_new
FROM placed
"""

QUERIES["q_ring_rebalance"] = QuerySpec(
    q_ring_rebalance,
    Q_REBAL_SQL,
    "consistent-hash movement when a 9th node joins — two broadcast "
    "rings, per-key successor compare, ring-invariant check",
)

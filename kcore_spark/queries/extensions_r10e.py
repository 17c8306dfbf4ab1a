"""Round-10 surface extensions, batch E (SURVEY §2.3 N r10): the
graph-analytics block II on the REPEAT co-purchase part graph (parts
linked when they co-occur in >= 2 orders — the support floor keeps
the projection sparse, the same df-cutoff stance as the dedup
family): per-node local clustering coefficients, edge embeddedness
(neighbor-set Jaccard of connected pairs), and the rich-club
coefficient curve (degree assortativity already lives in
extensions_r8d on the supplier graph).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: everything is integer counting (edges, degrees,
triangles) with one final double division per output row; orderings
fully tie-broken.

Scale shape: the order->pair explode is per-order (bounded fan-out:
line items per order), the support floor prunes before any graph
join, and the triangle join is the ordered (s1 < s2) self-join the
registry already pins in q_supplier_triangles — no all-pairs step
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_MIN_SUPPORT = 2

_EDGE_SQL = f"""
co AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS pa, b.p AS pb
  FROM co a JOIN co b ON a.ok = b.ok AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {_MIN_SUPPORT}),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT pa AS node FROM edges UNION ALL SELECT pb AS node FROM edges)
  GROUP BY node)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    return (
        li.alias("a")
        .join(li.alias("b"), (F.col("a.ok") == F.col("b.ok")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("supp"))
        .where(F.col("supp") >= _MIN_SUPPORT)
        .select("pa", "pb")
    )


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _triangle_corners(edges: DataFrame) -> DataFrame:
    """One row per (triangle, corner): the ordered wedge join e1(a,b)
    + e2(b,c) closed by e3(a,c), exploded to its three corners."""
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e1.pb") == F.col("e2.pa"))
        .join(
            edges.alias("e3"),
            (F.col("e1.pa") == F.col("e3.pa")) & (F.col("e2.pb") == F.col("e3.pb")),
            "left_semi",
        )
        .select(
            F.col("e1.pa").alias("a"), F.col("e1.pb").alias("b"), F.col("e2.pb").alias("c")
        )
    )
    return tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )


# ----------------------------- local clustering coefficient (top-k)
# cc(v) = triangles_at(v) / C(deg(v), 2). Output: the 10 most
# clustered parts with degree >= 4 (tie-broken by part key) plus
# their degrees and triangle counts.


def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    edges = transient_persist(_edges(spark, sf_dir))
    deg = _degrees(edges)
    tri_n = _triangle_corners(edges).groupBy("node").agg(
        F.count(F.lit(1)).alias("tri")
    )
    cc = (
        deg.where(F.col("d") >= 4)
        .join(tri_n, "node", "left")
        .na.fill({"tri": 0})
        .select(
            F.col("node").alias("part"),
            F.col("d").cast("long").alias("degree"),
            F.col("tri").cast("long").alias("n_triangles"),
            F.round(
                F.col("tri") * 2.0 / (F.col("d") * (F.col("d") - 1)), 6
            ).alias("clustering_coef"),
        )
    )
    return cc.orderBy(
        F.col("clustering_coef").desc(), F.col("degree").desc(), F.col("part")
    ).limit(10)


Q_LOCAL_CC_SQL = f"""
WITH {_EDGE_SQL},
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM edges e1 JOIN edges e2 ON e1.pb = e2.pa
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.pa = e1.pa AND e3.pb = e2.pb)),
corners AS (
  SELECT a AS node FROM tri UNION ALL
  SELECT b AS node FROM tri UNION ALL
  SELECT c AS node FROM tri),
tri_n AS (SELECT node, COUNT(*) AS tri FROM corners GROUP BY node)
SELECT d.node AS part, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(t.tri, 0) AS BIGINT) AS n_triangles,
       ROUND(COALESCE(t.tri, 0) * 2.0 / (d.d * (d.d - 1)), 6)
         AS clustering_coef
FROM deg d LEFT JOIN tri_n t ON t.node = d.node
WHERE d.d >= 4
ORDER BY clustering_coef DESC, degree DESC, part
LIMIT 10
"""

QUERIES["q_local_clustering"] = QuerySpec(
    q_local_clustering,
    Q_LOCAL_CC_SQL,
    "local clustering coefficients on the repeat co-purchase part "
    "graph (per-corner triangle counts) — top-10 most clustered",
)


# --------------------------- edge embeddedness (neighbor Jaccard)
# For each EXISTING edge (a, b): |N(a) ∩ N(b)| = triangles through
# the edge; Jaccard = common / (deg_a + deg_b - 2 - common). The
# strong-tie detector — candidate pairs are the edge list itself,
# never wedges, so the join stays edge-sized.


def q_edge_embeddedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    edges = transient_persist(_edges(spark, sf_dir))
    deg = _degrees(edges)
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e1.pb") == F.col("e2.pa"))
        .join(
            edges.alias("e3"),
            (F.col("e1.pa") == F.col("e3.pa")) & (F.col("e2.pb") == F.col("e3.pb")),
            "left_semi",
        )
        .select(
            F.col("e1.pa").alias("a"), F.col("e1.pb").alias("b"), F.col("e2.pb").alias("c")
        )
    )
    # each triangle (a<b<c) contributes one common neighbor to each of
    # its three edges: (a,b)<-c, (b,c)<-a, (a,c)<-b
    per_edge = (
        tri.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(tri.select(F.col("b").alias("x"), F.col("c").alias("y")))
        .unionAll(tri.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("d_a"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("d_b"))
    em = (
        edges.join(
            per_edge,
            (F.col("pa") == F.col("x")) & (F.col("pb") == F.col("y")),
            "left",
        )
        .na.fill({"common": 0})
        .join(da, "pa")
        .join(db, "pb")
        .select(
            "pa",
            "pb",
            F.col("common").cast("long").alias("n_common"),
            # an isolated edge (both endpoints degree 1) has an empty
            # union of other-neighbors: 0/0, pinned to 0
            F.round(
                F.when(
                    F.col("d_a") + F.col("d_b") - 2 - F.col("common") == 0,
                    F.lit(0.0),
                ).otherwise(
                    F.col("common")
                    / (F.col("d_a") + F.col("d_b") - 2 - F.col("common"))
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return em.orderBy(
        F.col("jaccard").desc(), F.col("n_common").desc(), "pa", "pb"
    ).limit(10)


Q_EMBED_SQL = f"""
WITH {_EDGE_SQL},
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM edges e1 JOIN edges e2 ON e1.pb = e2.pa
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.pa = e1.pa AND e3.pb = e2.pb)),
per_edge AS (
  SELECT x, y, COUNT(*) AS common FROM (
    SELECT a AS x, b AS y FROM tri UNION ALL
    SELECT b AS x, c AS y FROM tri UNION ALL
    SELECT a AS x, c AS y FROM tri)
  GROUP BY x, y)
SELECT e.pa, e.pb,
       CAST(COALESCE(p.common, 0) AS BIGINT) AS n_common,
       ROUND(CASE WHEN da.d + db.d - 2 - COALESCE(p.common, 0) = 0 THEN 0.0
             ELSE COALESCE(p.common, 0) * 1.0
                  / (da.d + db.d - 2 - COALESCE(p.common, 0)) END, 6) AS jaccard
FROM edges e
LEFT JOIN per_edge p ON p.x = e.pa AND p.y = e.pb
JOIN deg da ON da.node = e.pa
JOIN deg db ON db.node = e.pb
ORDER BY jaccard DESC, n_common DESC, pa, pb
LIMIT 10
"""

QUERIES["q_edge_embeddedness"] = QuerySpec(
    q_edge_embeddedness,
    Q_EMBED_SQL,
    "edge embeddedness (neighbor-set Jaccard of connected part "
    "pairs via per-edge triangle counts) — strong-tie detection",
)


# ------------------------------------------------ rich-club curve
# phi(k) = 2 E_k / (N_k (N_k - 1)) over nodes with degree > k, for a
# fixed threshold grid — do high-degree parts preferentially connect?
# One degree join + 3-row grid fan-out; integer counts.

_RC_GRID = [2, 4, 8]


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    edges = transient_persist(_edges(spark, sf_dir))
    deg = transient_persist(_degrees(edges))
    grid = F.array(*[F.lit(k) for k in _RC_GRID])
    ks = deg.sparkSession.range(1).select(F.explode(grid).alias("k"))
    nk = (
        ks.join(deg, deg.d > ks.k)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("d_a"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("d_b"))
    ej = edges.join(da, "pa").join(db, "pb")
    ek = (
        ks.join(ej, (F.col("d_a") > F.col("k")) & (F.col("d_b") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges_within"))
    )
    return (
        nk.join(ek, "k", "left")
        .na.fill({"n_edges_within": 0})
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges_within").cast("long").alias("n_edges_within"),
            F.round(
                2.0 * F.col("n_edges_within")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )


Q_RICH_SQL = f"""
WITH {_EDGE_SQL},
ks AS (SELECT UNNEST({_RC_GRID!r}) AS k),
nk AS (
  SELECT k, COUNT(*) AS n_nodes FROM ks JOIN deg ON deg.d > ks.k GROUP BY k),
ek AS (
  SELECT k, COUNT(*) AS n_edges_within
  FROM ks JOIN edges e ON TRUE
  JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb
  WHERE da.d > ks.k AND db.d > ks.k
  GROUP BY k)
SELECT CAST(nk.k AS INTEGER) AS k,
       CAST(nk.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(ek.n_edges_within, 0) AS BIGINT) AS n_edges_within,
       ROUND(2.0 * COALESCE(ek.n_edges_within, 0)
             / (nk.n_nodes * (nk.n_nodes - 1)), 6) AS phi
FROM nk LEFT JOIN ek ON nk.k = ek.k
ORDER BY k
"""

QUERIES["q_rich_club"] = QuerySpec(
    q_rich_club,
    Q_RICH_SQL,
    "rich-club coefficient curve over degree thresholds {2,4,8} on "
    "the repeat co-purchase graph — hub-interconnection audit",
)

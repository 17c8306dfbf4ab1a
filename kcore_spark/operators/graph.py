"""Iterative graph operator: connected components by min-label
propagation — the clustering step large-scale dedup needs (pairwise
near-dup edges → duplicate clusters → one canonical per cluster).

Provenance: declared surface of OUR engine (SURVEY §2.3 J); the
reference has no graph/dataflow operators (single-arm dispatch,
`/root/reference/pkg/kafka/kafka_api.go:84-97`).

Algorithm: every vertex starts labeled with itself; each round a
vertex takes the min of its own label and its neighbors' labels;
converged when no label changes. Deterministic (min is order-free),
and the label count per round is monotonically non-increasing.

Scale: each round is one shuffle join edges⋈labels + a min-aggregate
— the standard large-graph CC pattern (HashToMin). Rounds needed =
graph diameter; near-dup clusters are tiny (pairs/triples), so
convergence is 2-3 rounds. Each round's result is localCheckpointed
to truncate lineage (iterative plans otherwise grow exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """PageRank over directed ``edges`` (src, dst) in integer fixed-point.

    Ranks are BIGINTs scaled by 10^12; each round distributes
    ``rank div out_degree`` along out-edges and recombines with the
    standard damping split, all in integer arithmetic:

        new = (SCALE * 15) div 100  +  (85 * incoming) div 100

    Why fixed-point: float PageRank sums are order-dependent (double
    addition is not associative), so a distributed Spark sum and a
    single-threaded oracle sum can disagree in the last ulps and any
    rank-ordering assertion becomes flaky. Integer sums are exact and
    order-free — the result is bit-identical on any engine, which is
    what lets an iterative algorithm be value-hash-checked at all.
    Dangling nodes (no out-edges) leak their rank mass; both engines
    implement the same convention, and the leak only lowers the global
    sum, not the relative ordering this operator is used for.

    Scale: each iteration is one join (edges ⋈ ranks, shuffled on the
    edge key) + one aggregate — the standard large-graph pattern; the
    per-round localCheckpoint truncates the iterative lineage exactly
    as connected_components does. Returns (id, rank).
    """
    scale = 1_000_000_000_000
    # persisted: the deduped edge list feeds out_deg, both sides of the
    # degree join, and the node set — unpersisted, an expensive edge
    # derivation (e.g. a distinct over a fact join) re-runs per branch
    e = edges.select("src", "dst").distinct().persist()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # degrees pre-joined ONCE: each iteration is then a single
    # edges⋈ranks join + one aggregate, instead of re-deriving degrees
    # and paying a second join per round
    ewd = e.join(out_deg, "src").select("src", "dst", "out_deg").persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long")).localCheckpoint()
    base = (scale * 15) // 100
    try:
        for _ in range(iterations):
            contribs = (
                ewd.join(ranks, ewd.src == ranks.id)
                .select("dst", F.expr("rank div out_deg").alias("contrib"))
                .groupBy("dst")
                .agg(F.sum("contrib").alias("incoming"))
            )
            ranks = (
                nodes.join(contribs, nodes.id == contribs.dst, "left")
                .select(
                    "id",
                    (
                        F.lit(base).cast("long")
                        + F.expr("85 * coalesce(incoming, 0L) div 100")
                    ).alias("rank"),
                )
                # eager by default — the final round's checkpoint doubles
                # as the materialization barrier that makes it safe to
                # unpersist the intermediates below before returning
                .localCheckpoint()
            )
    finally:
        # the returned ranks are fully materialized by the eager
        # checkpoint, so the cached edge/degree/node tables can be
        # released here — repeated invocations in a long-lived session
        # otherwise accumulate cached partitions until eviction
        # pressure slows every later cache-dependent query
        for df in (e, ewd, nodes):
            df.unpersist()
    return ranks


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges: (src, dst) undirected. Returns (id, component) where
    component = min vertex id reachable."""
    edges_sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges_sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges_sym.join(labels, edges_sym.b == labels.id)
                .groupBy("a")
                .agg(F.min("component").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
    finally:
        # labels are materialized by the eager checkpoint each round;
        # the cached symmetric edge list is no longer needed
        edges_sym.unpersist()
    return labels

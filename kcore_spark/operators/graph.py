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
    return labels

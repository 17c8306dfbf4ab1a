"""Scale-operator queries (SURVEY §2.3 C): the skew/bucketing paths
under the oracle gate — proving the scale rewrites are RESULT-IDENTICAL
to the plain formulations, not just plan-shaped right (the unit tests
in tests/test_scale.py assert the plan shapes: even salt spread,
exchange-free bucketed joins).

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import money
from kcore_spark.operators.scale import bucketed_join, salted_join, write_bucketed
from kcore_spark.queries import QuerySpec

# -------------------------------------------------- salted join parity


def q_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue per market segment through the SALTED join path —
    the hot-key mitigation — with results identical to a plain join
    (the salt is an internal sub-key, invisible in the answer)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = salted_join(orders, cust, "o_custkey", "c_custkey", salt_factor=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_revenue"),
        )
        .orderBy("c_mktsegment")
    )


Q_SALTED_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# -------------------------------------------------- bucketed join parity


def q_bucketed_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order counts per nation through BUCKETED tables — the
    one-time-layout, exchange-free repeated-join path (plan asserted in
    tests/test_scale.py); the answer must equal the plain join's.
    Fixed table names are fine in the sequential harness (same
    convention as q18's temp views)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders.select("o_orderkey", "o_custkey"), "q_bkt_orders", "o_custkey")
    write_bucketed(
        cust.select("c_custkey", "c_nationkey"), "q_bkt_customer", "c_custkey"
    )
    j = bucketed_join(
        spark,
        "q_bkt_orders",
        "q_bkt_customer",
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        j.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("c_nationkey")
    )


Q_BUCKETED_SQL = """
SELECT c_nationkey, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ------------------------------------- clustered layout + pruned scan

RANGE_LO, RANGE_HI = 2000, 5000


def q_clustered_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping layout parity: orders rewritten as range-sorted
    runs with a min/max manifest (operators/layout.py), then a range
    query served by the manifest-pruned scan. The aggregate must match
    the oracle's plain filter over the original table — pruning is an
    optimization, never a semantics change. The pruning itself (subset
    of files touched, disjoint runs) is asserted in tests/test_layout."""
    import tempfile

    from kcore_spark.operators.layout import cluster_write, pruned_scan

    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="kcore_q_layout_")
    cluster_write(orders, path, "o_orderkey", num_files=8)
    got = pruned_scan(spark, path, "o_orderkey", RANGE_LO, RANGE_HI)
    return got.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(15,2)")).cast("double").alias("sum_total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    ).orderBy("o_orderstatus")


Q_CLUSTERED_SQL = f"""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_total,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders
WHERE o_orderkey BETWEEN {RANGE_LO} AND {RANGE_HI}
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""



def q_zorder_rect_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional data skipping: orders Z-ORDERED on (o_orderkey,
    o_custkey) — Morton-interleaved rank buckets, range-written — then
    a rectangle query served by the 2-dim manifest-pruned scan. The
    aggregate must match the oracle's plain 2-predicate filter (pruning
    is never a semantics change); that BOTH dimensions actually prune
    files is asserted in tests/test_layout."""
    import tempfile

    from kcore_spark.operators.layout import zorder_scan, zorder_write

    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="kcore_q_zorder_")
    zorder_write(orders, path, "o_orderkey", "o_custkey", num_files=16)
    got = zorder_scan(
        spark, path, "o_orderkey", 1000, 20000, "o_custkey", 100, 600
    )
    return got.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(15,2)")).cast("double").alias("sum_total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_custkey").alias("max_cust"),
    ).orderBy("o_orderstatus")


Q_ZORDER_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_total,
       MIN(o_orderkey) AS min_key,
       MAX(o_custkey) AS max_cust
FROM orders
WHERE o_orderkey BETWEEN 1000 AND 20000
  AND o_custkey BETWEEN 100 AND 600
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "q_zorder_rect_scan": QuerySpec(
        q_zorder_rect_scan, Q_ZORDER_SQL, "Z-order 2-dim manifest-pruned rectangle scan"
    ),
    "q_clustered_range_scan": QuerySpec(
        q_clustered_range_scan,
        Q_CLUSTERED_SQL,
        "range-clustered layout + manifest-pruned scan, result parity",
    ),
    "q_salted_join_segments": QuerySpec(
        q_salted_join_segments, Q_SALTED_SQL, "skew-salted join, result parity"
    ),
    "q_bucketed_join_nations": QuerySpec(
        q_bucketed_join_nations, Q_BUCKETED_SQL, "bucketed exchange-free join, result parity"
    ),
}

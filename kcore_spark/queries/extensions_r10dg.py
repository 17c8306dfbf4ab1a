"""Round-10 surface extensions, batch DG (SURVEY §2.3 N r10): the
aggregate-surface block, third wave — predicate aggregates (count_if /
bool_and / bool_or plus max_by/min_by with UNIQUE ordering keys, so
ties cannot make the pick engine-dependent), GROUPING()/GROUPING_ID
semantics under ROLLUP (which output row is a subtotal, pinned across
dialects), and mixed DISTINCT aggregates in one SELECT (several
DISTINCT columns at once — the Expand-operator planner path that
single-distinct queries never touch). Completes §2.3 D/H next to
q_agg_extras / q_grouping_sets / q_group_by_all.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: predicates/count are exact; max_by keys are unique
(orderkey); sums are decimal cents.
Scale: pure aggregate pins riding one scan each; ROLLUP output is
group-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_agg_predicate_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderstatus",
    )
    return (
        orders.groupBy("grp")
        .agg(
            F.count_if(F.col("cents") > 25000000).cast("long").alias("n_big"),
            F.bool_and(F.col("cents") > 100000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            # ordering key made UNIQUE (cents then orderkey) so a cent
            # tie can never make the pick engine-dependent
            F.expr(
                "max_by(o_orderkey, CAST(cents AS DECIMAL(38,0)) * 10000000000"
                " + o_orderkey)"
            )
            .cast("long")
            .alias("biggest_order_key"),
            F.expr(
                "min_by(o_orderkey, CAST(cents AS DECIMAL(38,0)) * 10000000000"
                " + o_orderkey)"
            )
            .cast("long")
            .alias("smallest_order_key"),
        )
        .orderBy("grp")
    )


Q_PRED_SQL = """
SELECT o_orderpriority AS grp,
       CAST(count_if(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 25000000)
            AS BIGINT) AS n_big,
       bool_and(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 100000)
           AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       CAST(arg_max(o_orderkey,
                    CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))
                      * 10000000000 + o_orderkey)
            AS BIGINT) AS biggest_order_key,
       CAST(arg_min(o_orderkey,
                    CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))
                      * 10000000000 + o_orderkey)
            AS BIGINT) AS smallest_order_key
FROM orders GROUP BY 1 ORDER BY grp
"""

QUERIES["q_agg_predicate_family"] = QuerySpec(
    q_agg_predicate_family,
    Q_PRED_SQL,
    "count_if / bool_and / bool_or / max_by / min_by pins per priority "
    "— predicate-aggregate surface",
)


def q_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.substring("o_orderpriority", 1, 1).alias("prio"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return (
        orders.rollup("o_orderstatus", "prio")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)"))
            .cast("double")
            .alias("cents_sum"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("prio").cast("int").alias("g_prio"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "prio")
    )


Q_GID_SQL = """
SELECT o_orderstatus,
       substring(o_orderpriority, 1, 1) AS prio,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                AS DECIMAL(38,0))) AS DOUBLE) AS cents_sum,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(substring(o_orderpriority, 1, 1)) AS INT) AS g_prio,
       CAST(GROUPING(o_orderstatus) * 2
            + GROUPING(substring(o_orderpriority, 1, 1)) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, substring(o_orderpriority, 1, 1))
ORDER BY gid, o_orderstatus, prio
"""

QUERIES["q_grouping_id_rollup"] = QuerySpec(
    q_grouping_id_rollup,
    Q_GID_SQL,
    "GROUPING()/GROUPING_ID pins under ROLLUP — subtotal rows "
    "identified identically across dialects",
)


def q_mixed_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity"), 0).cast("long").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_pct"),
    )
    return (
        li.groupBy("grp")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias("nd_parts"),
            F.countDistinct("l_suppkey").cast("long").alias("nd_supps"),
            F.countDistinct("l_partkey", "l_suppkey").cast("long").alias(
                "nd_pairs"
            ),
            F.sum_distinct(F.col("q")).cast("long").alias("sum_distinct_q"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum_distinct(F.col("disc_pct")).cast("long").alias(
                "sum_distinct_disc"
            ),
        )
        .orderBy("grp")
    )


Q_MIXED_SQL = """
SELECT l_returnflag AS grp,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supps,
       CAST(COUNT(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS nd_pairs,
       CAST(SUM(DISTINCT CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS sum_distinct_q,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(DISTINCT CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_distinct_disc
FROM lineitem GROUP BY 1 ORDER BY grp
"""

QUERIES["q_mixed_distinct_aggregates"] = QuerySpec(
    q_mixed_distinct_aggregates,
    Q_MIXED_SQL,
    "several DISTINCT aggregates in one SELECT (Expand planner path) — "
    "multi-column distinct counts + distinct sums",
)

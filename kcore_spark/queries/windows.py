"""Window functions (SURVEY §2.3 E/F) + grouping sets (D).

Window determinism: every ORDER BY inside a window is total (unique
tie-break key) so rank/lag/running values are engine-independent.
Frame sums use exact decimals — Spark recomputes bounded frames while
DuckDB uses segment trees, so double sums would differ in association
order; decimals are associative-exact.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import money, top_k_per_group
from kcore_spark.queries import QuerySpec

# ------------------------------------------------ per-group top-k


def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


Q_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders)
WHERE rn <= 3
"""

# ------------------------------------------------ running / analytic


def q_window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov3 = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("rn"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(money("o_totalprice")).over(run).cast("double").alias("run_total"),
        (F.sum(money("o_totalprice")).over(mov3).cast("double") / F.count(F.lit(1)).over(mov3)).alias(
            "mov3_avg"
        ),
    )


Q_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS INT) AS rn,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# ------------------------------------------------ rank/dense_rank/ntile


def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wy = Window.partitionBy("o_orderstatus").orderBy(F.year("o_orderdate").asc())
    wt = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(wy).cast("int").alias("rank_year"),
        F.dense_rank().over(wy).cast("int").alias("dense_rank_year"),
        F.ntile(4).over(wt).cast("int").alias("price_quartile"),
    )


Q_WINDOW_RANKS_SQL = """
SELECT o_orderkey, o_orderstatus,
       CAST(RANK()       OVER (PARTITION BY o_orderstatus ORDER BY year(o_orderdate)) AS INT) AS rank_year,
       CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY year(o_orderdate)) AS INT) AS dense_rank_year,
       CAST(NTILE(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INT) AS price_quartile
FROM orders
"""

# ------------------------------------------------ rollup / cube


def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(15,2)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


Q_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       COALESCE(l_linestatus, '(all)') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("o_totalprice")).cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
            "sum_price",
        )
    )


Q_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

# ------------------------------------------------ percentiles / stats


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").alias("median_qty"),
            F.percentile("l_quantity", 0.25).alias("p25_qty"),
            F.percentile("l_quantity", 0.75).alias("p75_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


Q_PERCENTILES_SQL = """
SELECT l_returnflag,
       MEDIAN(l_quantity) AS median_qty,
       QUANTILE_CONT(l_quantity, 0.25) AS p25_qty,
       QUANTILE_CONT(l_quantity, 0.75) AS p75_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""

# ------------------------------------------------ collect_list / first/last


def q_grouped_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    return (
        nat.groupBy("n_regionkey")
        .agg(
            # Arrays never reach a final projection: the harness canonicalizer
            # hashes scalar cells only, so serialize the sorted list to CSV.
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.min("n_name").alias("first_nation"),
            F.max("n_name").alias("last_nation"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


Q_GROUPED_LISTS_SQL = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       MIN(n_name) AS first_nation,
       MAX(n_name) AS last_nation,
       COUNT(*) AS n
FROM nation
GROUP BY n_regionkey
"""


# ------------------------------------------------ pivot / string agg


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns (explicit value list keeps the
    schema static — mandatory at scale: an unbounded pivot is a
    driver-side distinct scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O", "P"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(15,2)")).cast("double"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o", "P": "qty_p"})
        .orderBy("l_returnflag")
    )


Q_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(15,2)) END) AS DOUBLE) AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(15,2)) END) AS DOUBLE) AS qty_o,
       CAST(SUM(CASE WHEN l_linestatus = 'P'
                     THEN CAST(l_quantity AS DECIMAL(15,2)) END) AS DOUBLE) AS qty_p
FROM lineitem
GROUP BY l_returnflag
"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (Spark 4 DataFrame.unpivot / SQL UNPIVOT)."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(money("o_totalprice")).cast("double").alias("total_price"),
        (F.sum(money("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price", "avg_price"],
        variableColumnName="metric",
        valueColumnName="val",
    ).orderBy("o_orderstatus", "metric")


Q_UNPIVOT_SQL = """
SELECT o_orderstatus, metric, val
FROM (SELECT o_orderstatus,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_price
      FROM orders GROUP BY o_orderstatus)
UNPIVOT (val FOR metric IN (n_orders, total_price, avg_price))
"""


def q_string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — native listagg (Spark 4) checked
    against DuckDB string_agg with ORDER BY."""
    nat = load_table(spark, sf_dir, "nation")
    return (
        nat.groupBy("n_regionkey")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("nations_csv"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


Q_STRING_AGG_SQL = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
       COUNT(*) AS n
FROM nation
GROUP BY n_regionkey
"""


# -------------------------------------------------- analytic functions
# percent_rank / cume_dist / nth_value over a total order (unique
# tie-break key, per the determinism contract).


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.nth_value("c_custkey", 2).over(wf).alias("second_poorest"),
        )
        .where(F.col("pr") >= 0.99)
        .orderBy("c_mktsegment", "c_custkey")
    )


Q_WINDOW_ANALYTICS_SQL = """
SELECT c_mktsegment, c_custkey, pr, cd, second_poorest
FROM (
  SELECT c_mktsegment, c_custkey,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal ASC, c_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_poorest
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC))
WHERE pr >= 0.99
"""


# -------------------------------------------------- deterministic sampling
# Reproducible hash-based sampling — the training-data way to subset:
# the same rows are sampled on ANY engine, any run, any partitioning
# (portable md5 arithmetic), unlike TABLESAMPLE/rand(seed) whose
# output is engine- and partitioning-dependent.


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    return (
        docs.where(bucket == 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("n_chars").cast("long")).alias("sampled_chars"),
        )
        .orderBy("source")
    )


Q_HASH_SAMPLE_SQL = """
SELECT source, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
GROUP BY source
"""


def q_window_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-EXCLUDE parity: each order against the average of the
    customer's OTHER orders (leave-one-out). Spark has no EXCLUDE
    clause, so the frame is rewritten algebraically —
    sum(partition) − current over count − 1 — with decimal-exact sums
    so the rewrite is bit-identical to DuckDB's native
    `ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE
    CURRENT ROW`. Single-order customers get NULLs (empty frame), on
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = money("o_totalprice")
    sum_others = F.sum(total).over(w) - total
    n_others = F.count(F.lit(1)).over(w) - 1
    return (
        orders.withColumn("sum_others", sum_others)
        .withColumn("n_others", n_others.cast("long"))
        .select(
            "o_orderkey",
            "o_custkey",
            "n_others",
            F.when(F.col("n_others") > 0, F.col("sum_others").cast("double")).alias(
                "sum_others_val"
            ),
            F.when(
                F.col("n_others") > 0,
                F.col("sum_others").cast("double") / F.col("n_others"),
            ).alias("avg_others"),
        )
        .orderBy("o_orderkey")
    )


Q_WINDOW_EXCLUDE_SQL = """
WITH x AS (
  SELECT o_orderkey, o_custkey,
         COUNT(*) OVER (PARTITION BY o_custkey) - 1 AS n_others,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
              OVER (PARTITION BY o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                    EXCLUDE CURRENT ROW) AS DOUBLE) AS sum_others_val
  FROM orders)
SELECT o_orderkey, o_custkey, n_others,
       sum_others_val,
       sum_others_val / NULLIF(n_others, 0) AS avg_others
FROM x
ORDER BY o_orderkey
"""


QUERIES = {
    "q_window_exclude_current": QuerySpec(
        q_window_exclude_current,
        Q_WINDOW_EXCLUDE_SQL,
        "leave-one-out frame (EXCLUDE CURRENT ROW parity)",
    ),
    "q_window_analytics": QuerySpec(
        q_window_analytics, Q_WINDOW_ANALYTICS_SQL, "percent_rank/cume_dist/nth_value"
    ),
    "q_hash_sample": QuerySpec(
        q_hash_sample, Q_HASH_SAMPLE_SQL, "deterministic hash sampling (portable)"
    ),
    "q_pivot_status": QuerySpec(q_pivot_status, Q_PIVOT_SQL, "pivot (static value list)"),
    "q_unpivot_metrics": QuerySpec(q_unpivot_metrics, Q_UNPIVOT_SQL, "unpivot wide→long"),
    "q_string_agg_nations": QuerySpec(q_string_agg_nations, Q_STRING_AGG_SQL, "ordered listagg"),
    "q_window_topk_orders": QuerySpec(q_window_topk_orders, Q_WINDOW_TOPK_SQL, "per-group top-k"),
    "q_window_running_totals": QuerySpec(
        q_window_running_totals, Q_WINDOW_RUNNING_SQL, "lag/lead/frames"
    ),
    "q_window_ranks": QuerySpec(q_window_ranks, Q_WINDOW_RANKS_SQL, "rank/dense_rank/ntile"),
    "q_rollup_returns": QuerySpec(q_rollup_returns, Q_ROLLUP_SQL, "rollup"),
    "q_cube_orders": QuerySpec(q_cube_orders, Q_CUBE_SQL, "cube"),
    "q_percentiles": QuerySpec(q_percentiles, Q_PERCENTILES_SQL, "median/percentiles"),
    "q_grouped_lists": QuerySpec(q_grouped_lists, Q_GROUPED_LISTS_SQL, "collect_list"),
}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture sampling: per-language admission rates
    (en 80%, de/es/fr 40%, zh 20%) applied via portable md5 bucketing —
    the deterministic version of sampleBy, reproducible across engines,
    runs and partitionings. The output mix is what a data-mixing stage
    feeds the tokenizer."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    rate = (
        F.when(F.col("lang") == "en", 80)
        .when(F.col("lang").isin("de", "es", "fr"), 40)
        .otherwise(20)
    )
    return (
        docs.where(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("n_chars").cast("long")).alias("sampled_chars"),
        )
        .orderBy("lang")
    )


Q_STRATIFIED_SAMPLE_SQL = """
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN 80 WHEN lang IN ('de','es','fr') THEN 40 ELSE 20 END
GROUP BY lang
"""


QUERIES["q_stratified_sample"] = QuerySpec(
    q_stratified_sample, Q_STRATIFIED_SAMPLE_SQL, "per-stratum mixture sampling (portable)"
)


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — finer than rollup/cube:
    exactly the (status, priority), (status), and () aggregates, with
    the bitmask distinguishing which level each row belongs to."""
    import uuid

    view = f"orders_gs_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


Q_GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


QUERIES["q_grouping_sets"] = QuerySpec(
    q_grouping_sets, Q_GROUPING_SETS_SQL, "explicit grouping sets + grouping_id"
)


# -------------------------------------------------- time-interval RANGE frame


def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user rolling aggregate via a RANGE frame on
    event time — the window-function way to get time-based sliding
    aggregates without exploding rows into overlapping buckets.

    RANGE frames are bounded by VALUE, not row position, so the result
    is independent of tie order — deterministic without a full
    tie-break — and the decimal frame sum is order-free. One shuffle
    (by user), one sort (by time): the plan a 100 TB event log wants,
    because each user's timeline sorts independently."""
    from kcore_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3599, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").alias("ts_s"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("sum_1h"),
        )
        .orderBy("event_id")
    )


Q_WINDOW_TIME_RANGE_SQL = """
SELECT event_id, user_id,
       CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


QUERIES["q_window_time_range"] = QuerySpec(
    q_window_time_range, Q_WINDOW_TIME_RANGE_SQL, "trailing-1h RANGE frame aggregate"
)

"""Round-10 surface extensions, batch BG (SURVEY §2.3 N r10): the
process-mining block — top trace variants (the ordered event-type
signature per user, the first table every process-mining tool
shows), happy-path conformance (share of users whose trace contains
the signup→view→click→purchase subsequence), and directly-follows
transition durations (count + mean + exact median gap per edge —
the timing companion to q_event_transitions' probabilities).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: traces are ordered by (ts, event_id) — a total order;
gaps are whole-second integers; exact percentiles via the
F.percentile <-> quantile_cont pairing; variant strings are plain
joins.
Scale: per-user aggregation (one keyed shuffle); traces are capped
at 10 steps for the variant table; transition stats are one
partitioned-lag pass + a pair-keyed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type array (total order: ts, event_id)."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    return ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts").alias("ts"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("et"),
                    )
                )
            ),
            lambda s: s["et"],
        ).alias("trace")
    )


_TRACES_SQL = """
  SELECT user_id,
         array_agg(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS trace
  FROM events GROUP BY user_id
"""


# ---------------------------------------------------- trace variants
# First 10 steps joined with '>'; top 10 variants by user count.


def q_trace_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    traces = _traces(spark, sf_dir)
    sig = traces.select(
        F.concat_ws(">", F.slice(F.col("trace"), 1, 10)).alias("variant"),
        F.least(F.size("trace"), F.lit(10)).alias("depth"),
    )
    return (
        sig.groupBy("variant", "depth")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "variant")
        .limit(10)
    )


Q_VARIANTS_SQL = f"""
WITH traces AS ({_TRACES_SQL}),
sig AS (
  SELECT array_to_string(trace[1:10], '>') AS variant,
         LEAST(len(trace), 10) AS depth
  FROM traces)
SELECT variant, CAST(depth AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM sig
GROUP BY variant, depth
ORDER BY n_users DESC, variant
LIMIT 10
"""

QUERIES["q_trace_variants"] = QuerySpec(
    q_trace_variants,
    Q_VARIANTS_SQL,
    "top-10 process trace variants (first 10 ordered steps per user) "
    "— one keyed rollup, sort+limit pushdown",
)


# --------------------------------------------- happy-path conformance
# Trace contains signup ... view ... click ... purchase in order.


def q_happy_path_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    traces = _traces(spark, sf_dir)
    joined = traces.select(
        F.concat_ws(">", F.col("trace")).alias("t"),
        F.size("trace").alias("ln"),
    )
    conform = F.col("t").like("%signup%view%click%purchase%")
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(conform.cast("long")).alias("n_conform"),
        (
            F.sum("ln").cast("double") / F.count(F.lit(1))
        ).alias("avg_len"),
    )
    return agg.select(
        "n_users",
        F.col("n_conform").cast("long").alias("n_conform"),
        F.round(
            F.col("n_conform").cast("double") / F.col("n_users").cast("double"), 6
        ).alias("conformance_rate"),
        F.round("avg_len", 6).alias("avg_trace_len"),
    )


Q_CONFORM_SQL = f"""
WITH traces AS ({_TRACES_SQL}),
joined AS (
  SELECT array_to_string(trace, '>') AS t, len(trace) AS ln FROM traces),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN t LIKE '%signup%view%click%purchase%'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_conform,
         CAST(SUM(ln) AS DOUBLE) / COUNT(*) AS avg_len
  FROM joined)
SELECT n_users, n_conform,
       ROUND(CAST(n_conform AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
           AS conformance_rate,
       ROUND(avg_len, 6) AS avg_trace_len
FROM agg
"""

QUERIES["q_happy_path_conformance"] = QuerySpec(
    q_happy_path_conformance,
    Q_CONFORM_SQL,
    "share of users whose trace contains the in-order happy path — "
    "ordered subsequence via LIKE on the joined trace",
)


# ------------------------------------------- transition durations
# Directly-follows gaps (whole seconds); count, mean, exact median
# per (from, to) edge.


def q_transition_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("nxt", F.lead("event_type").over(w))
        .withColumn(
            "gap",
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts"),
        )
        .where(F.col("nxt").isNotNull())
    )
    return (
        hops.groupBy(
            F.col("event_type").alias("from_type"), F.col("nxt").alias("to_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("gap")).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_gap_s"),
            F.round(F.percentile(F.col("gap").cast("double"), 0.5), 6).alias(
                "median_gap_s"
            ),
        )
        .orderBy("from_type", "to_type")
    )


Q_TRANS_DUR_SQL = """
WITH hops AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type,
         epoch(date_trunc('second',
               LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)))
         - epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS gap
  FROM events)
SELECT from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_s,
       ROUND(quantile_cont(CAST(gap AS DOUBLE), 0.5), 6) AS median_gap_s
FROM hops
WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""

QUERIES["q_transition_durations"] = QuerySpec(
    q_transition_durations,
    Q_TRANS_DUR_SQL,
    "directly-follows transition timing (count/mean/median gap) — "
    "one partitioned-lead pass, pair-keyed rollup",
)

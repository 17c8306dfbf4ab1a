"""Round-10 surface extensions, batch G (SURVEY §2.3 N r10): the
ops-planning block — the pre-flight calculations an engineer runs
BEFORE launching a 100 TB job: hash-partition balance of a candidate
shuffle key, required-sample-size (power) calculation per segment,
exact join-cardinality prediction from key histograms, and a
skew-salting plan derived from the key's multiplicity profile.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: buckets come from the md5-prefix portable hash (the
q_hash_sample idiom — Spark's hash() and DuckDB's hash() differ, so
neither is used); everything else is integer counting with one final
double per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_N_BUCKETS = 32


# ------------------------------------ hash-partition balance audit
# Would partitioning lineitem by l_partkey shuffle evenly into 32
# buckets? Bucket by the portable md5 hash, report the max/mean and
# min/mean bucket ratios plus the relative-imbalance coefficient —
# the go/no-go signal before picking a shuffle key. One map-side
# bucket assignment + 32-row rollup.


def q_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        (
            F.conv(
                F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % _N_BUCKETS
        ).alias("bucket")
    )
    per = li.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    m = per.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("total"),
        F.max("n").alias("mx"),
        F.min("n").alias("mn"),
    )
    mean = F.col("total").cast("double") / F.col("n_buckets")
    return m.select(
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("total").cast("long").alias("total_rows"),
        F.col("mx").cast("long").alias("max_bucket"),
        F.col("mn").cast("long").alias("min_bucket"),
        F.round(F.col("mx") / mean, 6).alias("max_over_mean"),
        F.round(F.col("mn") / mean, 6).alias("min_over_mean"),
    )


Q_PARTBAL_SQL = f"""
WITH b AS (
  SELECT ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
           % {_N_BUCKETS} AS bucket
  FROM lineitem),
per AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket),
m AS (
  SELECT COUNT(*) AS n_buckets, SUM(n) AS total, MAX(n) AS mx, MIN(n) AS mn
  FROM per)
SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(total AS BIGINT) AS total_rows,
       CAST(mx AS BIGINT) AS max_bucket,
       CAST(mn AS BIGINT) AS min_bucket,
       ROUND(mx / (CAST(total AS DOUBLE) / n_buckets), 6) AS max_over_mean,
       ROUND(mn / (CAST(total AS DOUBLE) / n_buckets), 6) AS min_over_mean
FROM m
"""

QUERIES["q_partition_balance"] = QuerySpec(
    q_partition_balance,
    Q_PARTBAL_SQL,
    "hash-partition balance audit of l_partkey into 32 portable-hash "
    "buckets — the shuffle-key go/no-go signal",
)


# --------------------------------- required sample size (power calc)
# For each market segment's observed conversion rate p (customers
# with >= 1 order), the sample size needed to estimate p within
# +/- 2% at 95% confidence: n = z^2 p(1-p) / e^2 — the planning
# arithmetic behind every sampled audit. Integer counts, closed-form
# doubles per 5-row output.

_Z_95 = 1.959963984540054
_MARGIN = 0.02


def q_sample_size_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    buyers = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("is_buyer", F.lit(1))
    )
    per = (
        cust.join(buyers, "c_custkey", "left")
        .na.fill({"is_buyer": 0})
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_buyer").alias("n_buyers"),
        )
    )
    p = F.col("n_buyers").cast("double") / F.col("n")
    need = F.ceil(F.lit(_Z_95 * _Z_95) * p * (1 - p) / F.lit(_MARGIN * _MARGIN))
    return per.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        F.round(p, 6).alias("conversion_rate"),
        need.cast("long").alias("required_sample"),
        (need <= F.col("n")).alias("population_sufficient"),
    ).orderBy("c_mktsegment")


Q_POWER_SQL = f"""
WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
per AS (
  SELECT c.c_mktsegment, COUNT(*) AS n,
         SUM(CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS n_buyers
  FROM customer c LEFT JOIN buyers b ON b.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
       ROUND(CAST(n_buyers AS DOUBLE) / n, 6) AS conversion_rate,
       CAST(CEIL({_Z_95} * {_Z_95} * (CAST(n_buyers AS DOUBLE) / n)
                 * (1 - CAST(n_buyers AS DOUBLE) / n)
                 / ({_MARGIN} * {_MARGIN})) AS BIGINT) AS required_sample,
       CEIL({_Z_95} * {_Z_95} * (CAST(n_buyers AS DOUBLE) / n)
            * (1 - CAST(n_buyers AS DOUBLE) / n)
            / ({_MARGIN} * {_MARGIN})) <= n AS population_sufficient
FROM per
ORDER BY c_mktsegment
"""

QUERIES["q_sample_size_power"] = QuerySpec(
    q_sample_size_power,
    Q_POWER_SQL,
    "required sample size per segment for a +/-2% 95%-CI conversion "
    "estimate (closed-form power arithmetic)",
)


# ------------------------------ exact join-cardinality prediction
# Predicted |orders JOIN lineitem ON orderkey| = SUM_k c_o(k)*c_l(k)
# from the two key histograms — the number a cost-based planner needs
# BEFORE running the join — validated against the actual join count
# in the same result row. Histogram-sized shuffle, never the join
# itself... and then the join, to prove the prediction exact.


def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("c_o"))
    l = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("c_l"))
    pred = o.join(l, "k").agg(
        F.sum(F.col("c_o") * F.col("c_l")).alias("predicted"),
        F.count(F.lit(1)).alias("n_matching_keys"),
    )
    actual = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    return pred.crossJoin(F.broadcast(actual)).select(
        F.col("n_matching_keys").cast("long").alias("n_matching_keys"),
        F.col("predicted").cast("long").alias("predicted_rows"),
        F.col("actual").cast("long").alias("actual_rows"),
        (F.col("predicted") == F.col("actual")).alias("prediction_exact"),
    )


Q_JOINCARD_SQL = """
WITH o AS (SELECT o_orderkey AS k, COUNT(*) AS c_o FROM orders GROUP BY 1),
l AS (SELECT l_orderkey AS k, COUNT(*) AS c_l FROM lineitem GROUP BY 1),
pred AS (
  SELECT SUM(c_o * c_l) AS predicted, COUNT(*) AS n_matching_keys
  FROM o JOIN l USING (k)),
act AS (
  SELECT COUNT(*) AS actual
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
SELECT CAST(n_matching_keys AS BIGINT) AS n_matching_keys,
       CAST(predicted AS BIGINT) AS predicted_rows,
       CAST(actual AS BIGINT) AS actual_rows,
       predicted = actual AS prediction_exact
FROM pred, act
"""

QUERIES["q_join_cardinality_estimate"] = QuerySpec(
    q_join_cardinality_estimate,
    Q_JOINCARD_SQL,
    "exact join-cardinality prediction from key histograms, validated "
    "against the actual join — the CBO primitive",
)


# ----------------------------------------- skew-salting plan
# From l_suppkey's multiplicity profile: keys whose count exceeds
# SKEW_FACTOR x the mean get a salt fan-out of ceil(count/mean) —
# the plan a salted join would apply. Output (always 1 row, also on a
# skew-free fixture): number of skewed keys, the heaviest key, the
# max fan-out, and total extra rows the salt replication would add to
# the small side.

_SKEW_FACTOR = 2


def q_skew_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_suppkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = per.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("c").alias("total")
    )
    j = per.crossJoin(F.broadcast(m)).withColumn(
        "mean", F.col("total").cast("double") / F.col("n_keys")
    )
    skew = F.col("c") > F.lit(_SKEW_FACTOR) * F.col("mean")
    fanout = F.ceil(F.col("c") / F.col("mean")).cast("long")
    stats = j.agg(
        F.max("n_keys").cast("long").alias("n_keys"),
        F.sum(skew.cast("int")).cast("long").alias("n_skewed_keys"),
        F.coalesce(F.max(F.when(skew, fanout)), F.lit(1))
        .cast("long")
        .alias("max_fanout"),
        F.coalesce(F.sum(F.when(skew, fanout - 1)), F.lit(0))
        .cast("long")
        .alias("extra_small_side_rows"),
    )
    worst = (
        per.orderBy(F.col("c").desc(), F.col("k"))
        .limit(1)
        .select(
            F.col("k").cast("long").alias("heaviest_key"),
            F.col("c").cast("long").alias("heaviest_count"),
        )
    )
    return stats.crossJoin(F.broadcast(worst)).select(
        "n_keys", "n_skewed_keys", "heaviest_key", "heaviest_count",
        "max_fanout", "extra_small_side_rows",
    )


Q_SALT_SQL = f"""
WITH per AS (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
m AS (SELECT COUNT(*) AS n_keys, SUM(c) AS total FROM per),
j AS (
  SELECT per.k, per.c, m.n_keys, CAST(m.total AS DOUBLE) / m.n_keys AS mean
  FROM per, m),
stats AS (
  SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN c > {_SKEW_FACTOR} * mean THEN 1 ELSE 0 END)
              AS BIGINT) AS n_skewed_keys,
         CAST(COALESCE(MAX(CASE WHEN c > {_SKEW_FACTOR} * mean
                    THEN CAST(CEIL(c / mean) AS BIGINT) END), 1) AS BIGINT)
           AS max_fanout,
         CAST(COALESCE(SUM(CASE WHEN c > {_SKEW_FACTOR} * mean
                    THEN CAST(CEIL(c / mean) AS BIGINT) - 1 END), 0) AS BIGINT)
           AS extra_small_side_rows
  FROM j),
worst AS (
  SELECT CAST(k AS BIGINT) AS heaviest_key, CAST(c AS BIGINT) AS heaviest_count
  FROM per ORDER BY c DESC, k LIMIT 1)
SELECT n_keys, n_skewed_keys, heaviest_key, heaviest_count,
       max_fanout, extra_small_side_rows
FROM stats, worst
"""

QUERIES["q_skew_salting_plan"] = QuerySpec(
    q_skew_salting_plan,
    Q_SALT_SQL,
    "skew-salting plan from l_suppkey multiplicities (fan-out = "
    "ceil(count/mean) for keys above 2x mean)",
)

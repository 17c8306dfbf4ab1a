"""Round-8 part G, data-quality / engine-surface block (split from
extensions_r8g per the r9 verdict; behavior unchanged): bitmap exact
distinct, observed metrics (observe API), SQL dialect extras,
missing-value imputation, referential-integrity audit, join-key skew
report, round-number bias, and duplicate-payment detection.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

# ------------------------- bitmap-backed exact distinct (Spark 3.5+)
# Exact count-distinct users per event type AND overall via the
# bitmap aggregate family: bitmap_construct_agg per (type, bucket)
# partial — each partial is a 4KB bitmap, so the shuffle carries
# bitmaps, not user ids — then bitmap_count, and bitmap_or_agg to
# merge type-level bitmaps into the overall count without a second
# scan. This is the 100TB-scale exact-distinct pattern (HLL/theta
# cover the approximate side elsewhere in the registry). Oracle:
# plain COUNT(DISTINCT).


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "event_type", (F.col("user_id") + 1).alias("uid")
    )
    parts = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(uid)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    per_type = parts.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users")
    )
    overall = (
        parts.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("obm"))
        .agg(F.sum(F.expr("bitmap_count(obm)")).alias("distinct_users"))
        .select(F.lit("ALL").alias("event_type"), "distinct_users")
    )
    return per_type.unionByName(overall).orderBy("event_type")


Q_BITMAP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS distinct_users
FROM events
ORDER BY event_type
"""

QUERIES["q_bitmap_distinct"] = QuerySpec(
    q_bitmap_distinct,
    Q_BITMAP_SQL,
    "exact distinct users per event type + overall via Spark 3.5 bitmap "
    "aggregates (bitmap partials shuffle, bitmap_or_agg merge)",
)


# -------------------------------------- observed metrics (observe API)
# Spark's Observation API: data-quality counters that ride the main
# scan as accumulator-backed aggregates — the production pattern for
# emitting row counts / checksums on a write path WITHOUT a second
# scan. One action materializes the metrics; the query returns them
# as a row, and the oracle recomputes the same aggregates in SQL, so
# the accumulator path itself is value-checked cross-engine.


def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents_sum"
        ),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("min_day"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("max_day"),
    )
    observed.count()  # the single pass the metrics ride (no extra scan)
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["cents_sum"], m["min_day"], m["max_day"])],
        "n_rows long, cents_sum long, min_day string, max_day string",
    )


Q_OBSERVE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents_sum,
       MIN(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) AS min_day,
       MAX(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) AS max_day
FROM orders
"""

QUERIES["q_observe_metrics"] = QuerySpec(
    q_observe_metrics,
    Q_OBSERVE_SQL,
    "Observation API: accumulator-backed DQ metrics riding the main scan, "
    "value-checked against plain SQL aggregates",
)


# ------------------------------- SQL dialect extras (4.x surface)
# GROUP BY ALL / ORDER BY ALL / LIMIT-OFFSET pagination / try_divide
# null-on-zero — the modern-dialect conveniences a user migrating
# SQL workloads expects, pinned cross-engine in one statement
# (DuckDB speaks the same dialect for all four).


def q_sql_dialect_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_dialect_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               COUNT(*) AS n,
               try_divide(COUNT(*), SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END))
                 AS div_by_zero
        FROM li_dialect_v
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 3 OFFSET 1
        """
    )


Q_DIALECT_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       COUNT(*) AS n,
       CASE WHEN SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) = 0 THEN NULL
            ELSE CAST(COUNT(*) AS DOUBLE)
                 / SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) END AS div_by_zero
FROM lineitem
GROUP BY ALL
ORDER BY ALL
LIMIT 3 OFFSET 1
"""

QUERIES["q_sql_dialect_extras"] = QuerySpec(
    q_sql_dialect_extras,
    Q_DIALECT_SQL,
    "GROUP BY ALL / ORDER BY ALL / LIMIT-OFFSET / try_divide dialect pins",
)


# ------------------------------------------- missing-value imputation
# Feature-engineering repair: 'error' events are treated as missing
# readings; each is imputed with the user's median over observed
# (non-error) values, falling back to the global median for users
# with no observations. Medians are exact (integer value domain via
# the cents scaling + DuckDB/Spark shared lower-interpolation on
# percentile_disc-style pick): we use the LOW median (percentile_disc
# 0.5-equivalent) computed via the cumulative walk so both engines
# agree bit-for-bit. Output: per-user imputed/observed counts and the
# decimal-exact post-imputation sum. Shapes: two keyed partial-agg
# shuffles + one broadcast of the 1-row global median.


def q_impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
    )
    obs = ev.where(F.col("event_type") != "error")
    # LOW median via the integer cumulative-weight walk (2*cumw >= n)
    vals = obs.groupBy("user_id", "v").agg(F.count(F.lit(1)).alias("c"))
    win = Window.partitionBy("user_id").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_u = Window.partitionBy("user_id")
    med_u = (
        vals.withColumn("cumc", F.sum("c").over(win))
        .withColumn("n", F.sum("c").over(w_u))
        .where(2 * F.col("cumc") >= F.col("n"))
        .groupBy("user_id")
        .agg(F.min("v").alias("user_median"))
    )
    gvals = obs.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    gwin = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    g_all = Window.partitionBy()
    med_g = (
        gvals.withColumn("cumc", F.sum("c").over(gwin))
        .withColumn("n", F.sum("c").over(g_all))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("v").alias("global_median"))
    )
    filled = (
        ev.join(med_u, "user_id", "left")
        .crossJoin(F.broadcast(med_g))
        .select(
            "user_id",
            (F.col("event_type") == "error").cast("int").alias("was_missing"),
            F.when(
                F.col("event_type") == "error",
                F.coalesce(F.col("user_median"), F.col("global_median")),
            )
            .otherwise(F.col("v"))
            .alias("v_imp"),
        )
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.sum("was_missing").alias("n_imputed"),
            F.sum(F.lit(1) - F.col("was_missing")).alias("n_observed"),
            F.sum("v_imp").alias("imputed_sum"),
        )
        .orderBy("user_id")
    )


Q_IMPUTE_SQL = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v
  FROM events),
obs AS (SELECT * FROM ev WHERE event_type <> 'error'),
vals AS (
  SELECT user_id, v, COUNT(*) AS c FROM obs GROUP BY 1, 2),
med_u AS (
  SELECT user_id, MIN(v) AS user_median FROM (
    SELECT user_id, v,
           SUM(c) OVER (PARTITION BY user_id ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           SUM(c) OVER (PARTITION BY user_id) AS n
    FROM vals) WHERE 2 * cumc >= n GROUP BY user_id),
gvals AS (SELECT v, COUNT(*) AS c FROM obs GROUP BY v),
med_g AS (
  SELECT MIN(v) AS global_median FROM (
    SELECT v,
           SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           SUM(c) OVER () AS n
    FROM gvals) WHERE 2 * cumc >= n),
filled AS (
  SELECT ev.user_id,
         CASE WHEN ev.event_type = 'error' THEN 1 ELSE 0 END AS was_missing,
         CASE WHEN ev.event_type = 'error'
              THEN COALESCE(med_u.user_median, med_g.global_median)
              ELSE ev.v END AS v_imp
  FROM ev LEFT JOIN med_u ON med_u.user_id = ev.user_id
  CROSS JOIN med_g)
SELECT user_id,
       CAST(SUM(was_missing) AS BIGINT) AS n_imputed,
       CAST(SUM(1 - was_missing) AS BIGINT) AS n_observed,
       CAST(SUM(v_imp) AS BIGINT) AS imputed_sum
FROM filled GROUP BY user_id ORDER BY user_id
"""

QUERIES["q_impute_missing"] = QuerySpec(
    q_impute_missing,
    Q_IMPUTE_SQL,
    "missing-value imputation: per-user LOW median with global-median "
    "fallback (integer cumulative walks, decimal-exact post-fill sums)",
)


# --------------------------------------- referential-integrity audit
# The whole-schema DQ scan a warehouse runs before publishing: every
# foreign-key edge is checked for orphans (left-anti join, dimension
# side broadcast) and every primary key for duplicates (groupBy
# having count > 1). One output row per check. At 100 TB each check
# is an independent scan+anti-join — embarrassingly parallel across
# checks, and the anti joins broadcast the smaller parent whenever
# stats allow.


def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in (
        "lineitem", "orders", "customer", "supplier", "part", "nation", "region"
    )}
    fk_edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    pk_checks = [
        ("pk:orders.o_orderkey", "orders", "o_orderkey"),
        ("pk:customer.c_custkey", "customer", "c_custkey"),
        ("pk:part.p_partkey", "part", "p_partkey"),
        ("pk:supplier.s_suppkey", "supplier", "s_suppkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in fk_edges:
        c = t[child].select(F.col(ck).alias("k"))
        p = t[parent].select(F.col(pk).alias("k"))
        orphans = c.join(p, "k", "left_anti")
        parts.append(
            c.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_rows"),
            ).crossJoin(
                F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_violations")))
            )
        )
    for name, tbl, pk in pk_checks:
        dups = (
            t[tbl].groupBy(pk).agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
        )
        parts.append(
            t[tbl].agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_rows"),
            ).crossJoin(
                F.broadcast(dups.agg(F.count(F.lit(1)).alias("n_violations")))
            )
        )
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out.orderBy("check_name")


Q_RI_SQL = """
SELECT * FROM (
  SELECT 'lineitem.l_orderkey->orders' AS check_name, COUNT(*) AS n_rows,
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey IS NULL) AS n_violations FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_partkey->part', COUNT(*),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_partkey IS NULL) FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
          WHERE s.s_suppkey IS NULL) FROM lineitem
  UNION ALL
  SELECT 'orders.o_custkey->customer', COUNT(*),
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL) FROM orders
  UNION ALL
  SELECT 'customer.c_nationkey->nation', COUNT(*),
         (SELECT COUNT(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_nationkey IS NULL) FROM customer
  UNION ALL
  SELECT 'supplier.s_nationkey->nation', COUNT(*),
         (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_nationkey IS NULL) FROM supplier
  UNION ALL
  SELECT 'nation.n_regionkey->region', COUNT(*),
         (SELECT COUNT(*) FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_regionkey IS NULL) FROM nation
  UNION ALL
  SELECT 'pk:orders.o_orderkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)) FROM orders
  UNION ALL
  SELECT 'pk:customer.c_custkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1)) FROM customer
  UNION ALL
  SELECT 'pk:part.p_partkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING COUNT(*) > 1)) FROM part
  UNION ALL
  SELECT 'pk:supplier.s_suppkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT s_suppkey FROM supplier GROUP BY 1 HAVING COUNT(*) > 1)) FROM supplier
) ORDER BY check_name
"""

QUERIES["q_referential_integrity"] = QuerySpec(
    q_referential_integrity,
    Q_RI_SQL,
    "whole-schema referential-integrity audit: FK orphan counts (left-anti, "
    "broadcast parents) + PK duplicate counts, one row per check",
)


# ------------------------------------------------ join-key skew report
# The pre-join diagnostic behind every salting decision in this repo:
# per candidate join key, the per-key row-count distribution's max,
# LOW median, top-key share, and the salt factor a skew-aware join
# would apply (ceil(max/avg), capped at 32). All integer counts; the
# LOW median reuses the cumulative-walk machinery; ratios are final
# divisions. One partial-agg shuffle per key (cheap: count-by-key).


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    outs = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        per_key = li.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        vals = per_key.groupBy("c").agg(F.count(F.lit(1)).alias("nkeys"))
        win = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        w_all = Window.partitionBy()
        med = (
            vals.withColumn("cum", F.sum("nkeys").over(win))
            .withColumn("tot", F.sum("nkeys").over(w_all))
            .where(2 * F.col("cum") >= F.col("tot"))
            .agg(F.min("c").alias("median_rows"))
        )
        stats = per_key.agg(
            F.lit(col).alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_rows"),
        )
        outs.append(
            stats.crossJoin(F.broadcast(med)).select(
                "join_key",
                "n_keys",
                "n_rows",
                "max_rows",
                "median_rows",
                F.round(
                    F.col("max_rows") / (F.col("n_rows") / F.col("n_keys")).cast("double"),
                    6,
                ).alias("max_over_avg"),
                F.least(
                    F.lit(32),
                    F.ceil(
                        F.col("max_rows")
                        / (F.col("n_rows") / F.col("n_keys"))
                    ),
                ).cast("long").alias("suggested_salt"),
            )
        )
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    return out.orderBy("join_key")


Q_SKEWREPORT_SQL = """
WITH ks AS (
  SELECT 'l_orderkey' AS join_key, l_orderkey AS k FROM lineitem
  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
per_key AS (SELECT join_key, k, COUNT(*) AS c FROM ks GROUP BY 1, 2),
vals AS (SELECT join_key, c, COUNT(*) AS nkeys FROM per_key GROUP BY 1, 2),
med AS (
  SELECT join_key, MIN(c) AS median_rows FROM (
    SELECT join_key, c,
           SUM(nkeys) OVER (PARTITION BY join_key ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(nkeys) OVER (PARTITION BY join_key) AS tot
    FROM vals) WHERE 2 * cum >= tot GROUP BY join_key),
stats AS (
  SELECT join_key, COUNT(*) AS n_keys, SUM(c) AS n_rows, MAX(c) AS max_rows
  FROM per_key GROUP BY join_key)
SELECT s.join_key, CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(max_rows AS BIGINT) AS max_rows, CAST(median_rows AS BIGINT) AS median_rows,
       ROUND(max_rows / (CAST(n_rows AS DOUBLE) / n_keys), 6) AS max_over_avg,
       CAST(LEAST(32, CEIL(max_rows / (CAST(n_rows AS DOUBLE) / n_keys))) AS BIGINT)
         AS suggested_salt
FROM stats s JOIN med m ON m.join_key = s.join_key
ORDER BY s.join_key
"""

QUERIES["q_key_skew_report"] = QuerySpec(
    q_key_skew_report,
    Q_SKEWREPORT_SQL,
    "join-key skew report: per-key count distribution (max, LOW median, "
    "max/avg) and the capped salt factor a skew-aware join would apply",
)


# ------------------------------------------ round-number bias audit
# The forensic-accounting complement to Benford: the share of order
# totals landing on whole dollars (cents % 100 == 0) versus the 1%
# a uniform cents distribution implies, with the one-proportion
# z-score. All integer counts; z is the single final expression.
# Human-entered or manipulated amounts over-index on round numbers —
# the classic expense-fraud tell.


def q_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("cents") % 100 == 0).cast("int")).alias("n_round"),
    )
    p0 = 0.01
    return agg.select(
        "n",
        "n_round",
        F.round(F.col("n_round") / F.col("n").cast("double"), 8).alias(
            "round_share"
        ),
        F.round(
            (F.col("n_round") / F.col("n").cast("double") - F.lit(p0))
            / F.sqrt(F.lit(p0) * (1 - p0) / F.col("n")),
            6,
        ).alias("z_vs_uniform"),
    )


Q_ROUNDBIAS_SQL = """
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
agg AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS n_round
  FROM o)
SELECT CAST(n AS BIGINT) AS n, CAST(n_round AS BIGINT) AS n_round,
       ROUND(n_round / CAST(n AS DOUBLE), 8) AS round_share,
       ROUND((n_round / CAST(n AS DOUBLE) - 0.01)
             / SQRT(0.01 * 0.99 / n), 6) AS z_vs_uniform
FROM agg
"""

QUERIES["q_round_number_bias"] = QuerySpec(
    q_round_number_bias,
    Q_ROUNDBIAS_SQL,
    "round-number bias audit: whole-dollar share vs the uniform-cents 1% "
    "with a one-proportion z — the forensic complement to Benford",
)


# ------------------------------------------ duplicate-payment detect
# The financial-DQ double-charge scan: purchase events by the same
# user for the same amount within 5 minutes. Candidates come from an
# equi-join on (user, cents) — the natural blocking key, so the time
# band only scans within-block pairs — with the strict (sec, id)
# ordering making each unordered pair count once. Exact integer
# domain throughout.

DUP_WINDOW_S = 300


def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("cents"),
    )
    a = p.select("user_id", "cents", F.col("eid").alias("e1"), F.col("sec").alias("s1"))
    b = p.select("user_id", "cents", F.col("eid").alias("e2"), F.col("sec").alias("s2"))
    pairs = a.join(b, ["user_id", "cents"]).where(
        (
            (F.col("s1") < F.col("s2"))
            | ((F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")))
        )
        & (F.col("s2") - F.col("s1") <= DUP_WINDOW_S)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_suspect_pairs"),
        F.countDistinct("user_id").alias("n_users_flagged"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("exposure_cents"),
    )


Q_DUPPAY_SQL = f"""
WITH p AS (
  SELECT user_id, event_id AS eid,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT a.user_id, a.cents
  FROM p a JOIN p b
    ON b.user_id = a.user_id AND b.cents = a.cents
   AND (a.sec < b.sec OR (a.sec = b.sec AND a.eid < b.eid))
   AND b.sec - a.sec <= {DUP_WINDOW_S})
SELECT COUNT(*) AS n_suspect_pairs,
       COUNT(DISTINCT user_id) AS n_users_flagged,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS exposure_cents
FROM pairs
"""

QUERIES["q_duplicate_payments"] = QuerySpec(
    q_duplicate_payments,
    Q_DUPPAY_SQL,
    "double-charge scan: same (user, amount) within 5 minutes via the "
    "(user, cents) blocking equi-join + time band, pairs counted once",
)



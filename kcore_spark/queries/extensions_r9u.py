"""Round-9 surface extensions, batch U (SURVEY §2.3 N r9): a
from-scratch Bloom filter with MEASURED false-positive rate (the
sketch family's missing member: countmin/KLL/theta/HLL exist, the
bit-array membership sketch did not — built entirely from integer
bit-aggregates, no engine-private sketch formats), a right-to-be-
forgotten erasure audit (per-table residue counts for a deletion
cohort — completing the privacy family), and a data-completeness
calendar (expected-vs-actual hourly slots per event type).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------- Bloom filter from scratch + measured FPP
# m = 16384 bits as 512 32-bit words (shift stays < 32 so neither
# engine hits signed-shift overflow), k = 3 md5-derived positions per
# key. BUILD: explode the 3 positions, bit_or per word — a ≤256-row
# table that broadcasts anywhere. PROBE: every non-member key checks
# its 3 bits; all-present = false positive. The MEASURED fp rate
# sits next to the theoretical (1 − e^{−kn/m})^k so a broken hash or
# bit op shows up as a rate mismatch, not a silent wrong filter.
# Everything is integer bit algebra — bit-identical across engines.

_BLOOM_M = 16384
_BLOOM_WORDS = _BLOOM_M // 32


def _positions(key_col, j: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"b{j}|"), key_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % _BLOOM_M
    )


def q_bloom_fpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    # a strict subset at every SF (all customers buy at sf0.001):
    # members = customers holding an order whose key is divisible by 3
    members = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 3 == 0)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    pos = None
    for j in range(3):
        p = members.select(_positions(F.col("c_custkey"), j).alias("p"))
        pos = p if pos is None else pos.unionByName(p)
    bloom = pos.select(
        (F.col("p") / 32).cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(p % 32 AS INT))").alias("m"),
    ).groupBy("word").agg(F.bit_or("m").alias("bits"))
    negatives = cust.join(members, "c_custkey", "left_anti")
    probe = None
    for j in range(3):
        p = negatives.select(
            "c_custkey", _positions(F.col("c_custkey"), j).alias("p")
        )
        probe = p if probe is None else probe.unionByName(p)
    checked = (
        probe.select(
            "c_custkey",
            (F.col("p") / 32).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(p % 32 AS INT))").alias("m"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "c_custkey",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("m")) == F.col("m"))
            ).cast("int").alias("hit"),
        )
    )
    per_key = checked.groupBy("c_custkey").agg(
        (F.min("hit") == 1).cast("int").alias("fp")
    )
    n_mem = members.count()
    import math

    theo = round((1.0 - math.exp(-3.0 * n_mem / _BLOOM_M)) ** 3, 6)
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_negatives"),
        F.sum("fp").cast("long").alias("false_positives"),
        F.round(F.sum("fp") / F.count(F.lit(1)), 6).alias("measured_fpp"),
        F.lit(theo).alias("theoretical_fpp"),
    )


Q_BLOOM_SQL = f"""
WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0),
pos AS (
  SELECT ('0x' || substring(md5('b0|' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} AS p FROM members
  UNION ALL
  SELECT ('0x' || substring(md5('b1|' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} FROM members
  UNION ALL
  SELECT ('0x' || substring(md5('b2|' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} FROM members),
bloom AS (
  SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1),
negatives AS (
  SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT k FROM members)),
probe AS (
  SELECT c_custkey, ('0x' || substring(md5('b0|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} AS p FROM negatives
  UNION ALL
  SELECT c_custkey, ('0x' || substring(md5('b1|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} FROM negatives
  UNION ALL
  SELECT c_custkey, ('0x' || substring(md5('b2|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} FROM negatives),
checked AS (
  SELECT c_custkey,
         CASE WHEN bits IS NOT NULL
               AND (bits & (1::BIGINT << CAST(p % 32 AS INT)))
                   = (1::BIGINT << CAST(p % 32 AS INT))
              THEN 1 ELSE 0 END AS hit
  FROM probe LEFT JOIN bloom ON p // 32 = bloom.word),
per_key AS (
  SELECT c_custkey, CASE WHEN MIN(hit) = 1 THEN 1 ELSE 0 END AS fp
  FROM checked GROUP BY c_custkey),
n_mem AS (SELECT COUNT(*) AS n FROM members)
SELECT CAST(COUNT(*) AS BIGINT) AS n_negatives,
       CAST(SUM(fp) AS BIGINT) AS false_positives,
       ROUND(SUM(fp) * 1.0 / COUNT(*), 6) AS measured_fpp,
       ROUND(POW(1.0 - EXP(-3.0 * (SELECT n FROM n_mem) / {_BLOOM_M}), 3), 6)
         AS theoretical_fpp
FROM per_key
"""

QUERIES["q_bloom_fpp"] = QuerySpec(
    q_bloom_fpp,
    Q_BLOOM_SQL,
    "from-scratch Bloom filter (16384 bits, 512 32-bit words, 3 md5 "
    "hashes as integer bit_or words) with MEASURED vs theoretical FPP",
)


# --------------------------- right-to-be-forgotten erasure audit
# For a deletion cohort (custkey % 97 == 0): residue counts per table
# — direct references (orders), transitive ones (lineitem through
# orders), and the entity rows themselves. A clean post-erasure run
# returns zeros; on the untouched fixture the audit REPORTS the work.
# Scale: one semi-join per table against the broadcast cohort.


def q_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    cohort = cust.where(F.col("c_custkey") % 97 == 0)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_res = orders.join(
        F.broadcast(cohort), orders.o_custkey == cohort.c_custkey, "left_semi"
    )
    li_res = li.join(
        o_res.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    rows = [
        ("customer", cohort),
        ("orders", o_res),
        ("lineitem", li_res),
    ]
    out = None
    for name, df in rows:
        r = df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("residue_rows"),
        )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("table_name")


Q_ERASURE_SQL = """
WITH cohort AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
o_res AS (SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM cohort))
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS residue_rows FROM cohort
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM o_res)
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM o_res
ORDER BY table_name
"""

QUERIES["q_erasure_audit"] = QuerySpec(
    q_erasure_audit,
    Q_ERASURE_SQL,
    "right-to-be-forgotten audit: direct + transitive residue counts "
    "per table for a deletion cohort — broadcast semi-joins",
)


# ------------------------------ data-completeness calendar
# Expected hourly slots (the min→max hour spine) vs actually-observed
# hours per event type: missing-slot count and the first gap. The
# spine is one sequence() explode per type — curve-sized; at 100 TB
# the heavy part stays the one rollup scan.


def q_missing_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    actual = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    gaps = spine.join(actual, ["event_type", "h"], "left_anti")
    g = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("missing_hours"),
        F.unix_timestamp(F.min("h")).alias("first_gap_epoch"),
    )
    return (
        spine.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("expected_hours"))
        .join(g, "event_type", "left")
        .na.fill({"missing_hours": 0})
        .orderBy("event_type")
    )


Q_MISSING_SQL = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
actual AS (SELECT DISTINCT event_type, h FROM ev),
bounds AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds),
gaps AS (
  SELECT s.event_type, s.h FROM spine s
  LEFT JOIN actual a ON s.event_type = a.event_type AND s.h = a.h
  WHERE a.h IS NULL),
g AS (
  SELECT event_type, COUNT(*) AS missing_hours,
         CAST(floor(epoch(MIN(h))) AS BIGINT) AS first_gap_epoch
  FROM gaps GROUP BY 1)
SELECT s.event_type, CAST(COUNT(*) AS BIGINT) AS expected_hours,
       CAST(COALESCE(MAX(g.missing_hours), 0) AS BIGINT) AS missing_hours,
       MAX(g.first_gap_epoch) AS first_gap_epoch
FROM spine s LEFT JOIN g ON s.event_type = g.event_type
GROUP BY s.event_type
ORDER BY s.event_type
"""

QUERIES["q_missing_slots"] = QuerySpec(
    q_missing_slots,
    Q_MISSING_SQL,
    "data-completeness calendar: expected vs observed hourly slots "
    "per event type, missing count + first gap",
)

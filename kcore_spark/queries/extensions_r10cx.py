"""Round-10 surface extensions, batch CX (SURVEY §2.3 N r10): the
forensic-accounting block, second wave — second-digit Benford (the
digit manipulators forget to fake after rigging the first digit,
which q_benford_digits already screens), last-digit uniformity (trailing
digits of honest amounts are uniform; chi-square against 0-9), and a
structuring screen (same customer, same day, multiple orders each
under the 200k threshold that TOGETHER cross it — the classic threshold-splitting
pattern, next to q_duplicate_payments / q_round_number_bias).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: digits are extracted from integer cents; expected Benford
masses are pinned literals; all counts exact.
Scale: digit screens are one-scan group-bys; the structuring screen is
a (customer, day)-keyed fold — no windows, no pair joins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

# P(second digit = d) = sum_{k=1..9} log10(1 + 1/(10k + d)), pinned 6dp
_BENFORD2 = {
    d: round(sum(math.log10(1 + 1.0 / (10 * k + d)) for k in range(1, 10)), 6)
    for d in range(10)
}
_THRESHOLD = 200000.0  # structuring threshold (dollars; fixture prices run to ~500k)


def q_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    ).where(F.col("c") >= 10)
    d2 = cents.select(
        F.substring(F.col("c").cast("string"), 2, 1).cast("int").alias("d")
    )
    obs = d2.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = d2.agg(F.count(F.lit(1)).cast("long").alias("n"))
    exp_map = F.create_map(
        *[x for d, p in _BENFORD2.items() for x in (F.lit(d), F.lit(p))]
    )
    j = obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "o",
        "n",
        (F.element_at(exp_map, F.col("d")) * F.col("n")).alias("e"),
    )
    terms = j.select(
        "d",
        "o",
        F.round("e", 4).alias("expected"),
        F.round((F.col("o") - F.col("e")) ** 2 / F.col("e"), 10)
        .cast("decimal(38,10)")
        .alias("t"),
    )
    chi = terms.agg(F.round(F.sum("t").cast("double"), 6).alias("chi2"))
    return (
        terms.crossJoin(F.broadcast(chi))
        .select("d", "o", "expected", "chi2")
        .orderBy("d")
    )


_B2_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD2.items()
)
Q_BENFORD2_SQL = f"""
WITH d2 AS (
  SELECT CAST(SUBSTRING(CAST(c AS VARCHAR), 2, 1) AS INT) AS d
  FROM (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders)
  WHERE c >= 10),
obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS o FROM d2 GROUP BY d),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d2),
j AS (
  SELECT d, o, (CASE d {_B2_CASE} END) * n AS e
  FROM obs CROSS JOIN tot),
terms AS (
  SELECT d, o, ROUND(e, 4) AS expected,
         CAST(ROUND(POWER(o - e, 2) / e, 10) AS DECIMAL(38,10)) AS t
  FROM j),
chi AS (SELECT ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2 FROM terms)
SELECT d, o, expected, chi2
FROM terms CROSS JOIN chi ORDER BY d
"""

QUERIES["q_benford_second_digit"] = QuerySpec(
    q_benford_second_digit,
    Q_BENFORD2_SQL,
    "second-digit Benford screen on order amounts — pinned log10 "
    "masses, per-digit chi-square contributions",
)


def q_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = load_table(spark, sf_dir, "orders").select(
        (F.round(F.col("o_totalprice") * 100, 0).cast("long") % 10).alias("d")
    )
    obs = cents.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = cents.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = obs.crossJoin(F.broadcast(tot))
    e = F.col("n").cast("double") / 10.0
    terms = j.select(
        "d",
        "o",
        F.round((F.col("o") - e) ** 2 / e, 10).cast("decimal(38,10)").alias("t"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.round(F.sum("t").cast("double"), 6).alias("chi2_uniform"),
    )
    return agg.select(
        "k", (F.col("k") - 1).cast("long").alias("df"), "chi2_uniform"
    )


Q_LASTDIGIT_SQL = """
WITH d AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) % 10 AS d FROM orders),
obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS o FROM d GROUP BY d),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
terms AS (
  SELECT CAST(ROUND(POWER(o - n / 10.0, 2) / (n / 10.0), 10)
              AS DECIMAL(38,10)) AS t
  FROM obs CROSS JOIN tot)
SELECT CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(*) - 1 AS BIGINT) AS df,
       ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2_uniform
FROM terms
"""

QUERIES["q_last_digit_uniformity"] = QuerySpec(
    q_last_digit_uniformity,
    Q_LASTDIGIT_SQL,
    "last-digit uniformity chi-square on order cents — the trailing-"
    "digit honesty screen",
)


def q_structuring_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer, day) groups of >= 2 orders, each under the threshold,
    whose SUM crosses it — ranked by how far over they land."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    groups = (
        orders.where(F.col("cents") < int(_THRESHOLD * 100))
        .groupBy("o_custkey", "d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("day_cents"),
            F.max("cents").cast("long").alias("max_single"),
        )
    )
    flagged = groups.where(
        (F.col("n_orders") >= 2)
        & (F.col("day_cents") >= int(_THRESHOLD * 100))
    )
    return flagged.select(
        "o_custkey",
        F.unix_timestamp(F.col("d").cast("timestamp")).alias("day_epoch"),
        "n_orders",
        F.round(F.col("day_cents") / 100.0, 2).alias("day_total"),
        F.round(F.col("max_single") / 100.0, 2).alias("largest_single"),
    ).orderBy(F.col("day_total").desc(), "o_custkey", "day_epoch").limit(20)


Q_STRUCT_SQL = f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
groups AS (
  SELECT o_custkey, d,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS day_cents,
         CAST(MAX(cents) AS BIGINT) AS max_single
  FROM o WHERE cents < {int(_THRESHOLD * 100)}
  GROUP BY 1, 2)
SELECT o_custkey,
       CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) AS day_epoch,
       n_orders,
       ROUND(day_cents / 100.0, 2) AS day_total,
       ROUND(max_single / 100.0, 2) AS largest_single
FROM groups
WHERE n_orders >= 2 AND day_cents >= {int(_THRESHOLD * 100)}
ORDER BY day_total DESC, o_custkey, day_epoch LIMIT 20
"""

QUERIES["q_structuring_screen"] = QuerySpec(
    q_structuring_screen,
    Q_STRUCT_SQL,
    "threshold-structuring screen: same customer+day, sub-threshold "
    "orders summing over 200k — keyed fold, tie-broken top 20",
)

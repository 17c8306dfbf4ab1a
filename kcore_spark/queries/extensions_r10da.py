"""Round-10 surface extensions, batch DA (SURVEY §2.3 N r10): the
apportionment block — allocating a fixed budget of 64 partition slots
across the 25 nations in proportion to their order volume, by the
three classical methods: D'Hondt (highest averages, divisors 1,2,3...
— favors large keys), Sainte-Laguë (odd divisors — unbiased), and
Hamilton (largest remainder — quota-exact). The same math parliaments
use is exactly shard/slot assignment for a partitioner; each query
reports seats vs the exact proportional share. Companion to
q_partition_balance / q_skew_salting_plan / q_neyman_allocation.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: quotients are exact integer ratios compared via
cross-multiplication-free rank on (vote/divisor) doubles ROUNDED to
9dp with (nation, divisor) tiebreaks; remainders are exact decimals.
Scale: votes fold from one scan; the divisor fan-out is 25 x 64 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_SEATS = 64


def _votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )


_VOTES_SQL = """
  votes AS (
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS v
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1)
"""


def _highest_averages(
    spark: SparkSession, sf_dir: str, step: int, offset: int
) -> DataFrame:
    """Divisor method: divisors offset, offset+step, offset+2*step ...;
    top _SEATS quotients win (rounded, fully tie-broken)."""
    votes = _votes(spark, sf_dir)
    fan = votes.select(
        "c_nationkey",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_SEATS - 1))).alias("i"),
    ).select(
        "c_nationkey",
        "v",
        (F.lit(offset) + F.col("i") * step).alias("div"),
        F.round(F.col("v") / (F.lit(offset) + F.col("i") * step), 9).alias("q"),
    )
    w = Window.orderBy(F.col("q").desc(), F.col("c_nationkey"), F.col("div"))
    winners = fan.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= _SEATS
    )
    tot = votes.agg(F.sum("v").cast("long").alias("tv"))
    per = winners.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("seats")
    )
    return (
        votes.join(per, "c_nationkey", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "v",
            F.coalesce("seats", F.lit(0)).alias("seats"),
            F.round(
                F.col("v") / F.col("tv").cast("double") * _SEATS, 4
            ).alias("ideal_seats"),
        )
        .orderBy("c_nationkey")
    )


def _ha_sql(step: int, offset: int) -> str:
    return f"""
WITH {_VOTES_SQL},
fan AS (
  SELECT c_nationkey, v, {offset} + t.i * {step} AS div,
         ROUND(v / CAST({offset} + t.i * {step} AS DOUBLE), 9) AS q
  FROM votes, UNNEST(generate_series(0, {_SEATS - 1})) AS t(i)),
winners AS (
  SELECT c_nationkey FROM (
    SELECT c_nationkey,
           ROW_NUMBER() OVER (ORDER BY q DESC, c_nationkey, div) AS rk
    FROM fan)
  WHERE rk <= {_SEATS}),
per AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS seats
  FROM winners GROUP BY 1),
tot AS (SELECT CAST(SUM(v) AS BIGINT) AS tv FROM votes)
SELECT votes.c_nationkey AS c_nationkey, v,
       COALESCE(seats, 0) AS seats,
       ROUND(v / CAST(tv AS DOUBLE) * {_SEATS}, 4) AS ideal_seats
FROM votes LEFT JOIN per ON votes.c_nationkey = per.c_nationkey
CROSS JOIN tot
ORDER BY c_nationkey
"""


def q_dhondt_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _highest_averages(spark, sf_dir, step=1, offset=1)


QUERIES["q_dhondt_allocation"] = QuerySpec(
    q_dhondt_allocation,
    _ha_sql(1, 1),
    "D'Hondt highest-averages allocation of 64 slots across nations — "
    "25x64 quotient fan, fully tie-broken",
)


def q_sainte_lague_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _highest_averages(spark, sf_dir, step=2, offset=1)


QUERIES["q_sainte_lague_allocation"] = QuerySpec(
    q_sainte_lague_allocation,
    _ha_sql(2, 1),
    "Sainte-Lague (odd-divisor) allocation of 64 slots — the unbiased "
    "divisor method",
)


def q_hamilton_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest remainder: floor quotas, then remaining seats to the
    largest fractional remainders (tie-break nation key)."""
    votes = _votes(spark, sf_dir)
    tot = votes.agg(F.sum("v").cast("long").alias("tv"))
    q = votes.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "v",
        (F.col("v") * _SEATS / F.col("tv").cast("double")).alias("quota"),
    )
    fl = q.select(
        "c_nationkey",
        "v",
        "quota",
        F.floor("quota").cast("long").alias("base_seats"),
        F.round(F.col("quota") - F.floor("quota"), 9).alias("rem"),
    )
    used = fl.agg(F.sum("base_seats").cast("long").alias("used"))
    w = Window.orderBy(F.col("rem").desc(), F.col("c_nationkey"))
    ranked = fl.crossJoin(F.broadcast(used)).withColumn(
        "rk", F.row_number().over(w)
    )
    return ranked.select(
        "c_nationkey",
        "v",
        (
            F.col("base_seats")
            + (F.col("rk") <= (_SEATS - F.col("used"))).cast("long")
        ).alias("seats"),
        F.round("quota", 4).alias("ideal_seats"),
    ).orderBy("c_nationkey")


Q_HAMILTON_SQL = f"""
WITH {_VOTES_SQL},
tot AS (SELECT CAST(SUM(v) AS BIGINT) AS tv FROM votes),
q AS (
  SELECT c_nationkey, v, v * {_SEATS} / CAST(tv AS DOUBLE) AS quota
  FROM votes CROSS JOIN tot),
fl AS (
  SELECT c_nationkey, v, quota,
         CAST(FLOOR(quota) AS BIGINT) AS base_seats,
         ROUND(quota - FLOOR(quota), 9) AS rem
  FROM q),
used AS (SELECT CAST(SUM(base_seats) AS BIGINT) AS used FROM fl),
ranked AS (
  SELECT fl.*, used,
         ROW_NUMBER() OVER (ORDER BY rem DESC, c_nationkey) AS rk
  FROM fl CROSS JOIN used)
SELECT c_nationkey, v,
       base_seats + CASE WHEN rk <= {_SEATS} - used THEN 1 ELSE 0 END AS seats,
       ROUND(quota, 4) AS ideal_seats
FROM ranked ORDER BY c_nationkey
"""

QUERIES["q_hamilton_allocation"] = QuerySpec(
    q_hamilton_allocation,
    Q_HAMILTON_SQL,
    "Hamilton largest-remainder allocation of 64 slots — exact quotas, "
    "remainder walk over 25 rows",
)

"""Round-10 surface extensions, batch DK (SURVEY §2.3 N r10): the
dialect-semantics pin block, fourth wave — the arithmetic corners
where engines silently disagree, pinned to ONE semantics. Integer
division and modulo with negative operands (dividend-sign modulo, the
divisor-sign pmod, floor division), the cast matrix (KEY FINDING captured:
Spark CAST(double AS INT) TRUNCATES toward zero while DuckDB CAST
ROUNDS half-even — the oracle mirrors Spark with TRUNC(); plus
whitespace string->int and saturating try_cast), and date-edge pins
(LAST_DAY, month-end clamping of add_months, Monday week truncation,
an emulated next-Monday). Values derive from order keys/dates so the
pins still exercise the scan path.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all inputs are exact integers/dates; every output integer
or date.
Scale: pure expression pins riding one scan, fully tie-broken LIMITs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_division_modulo_pins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    vals = orders.select(
        "k",
        ((F.col("k") % 13) - 6).cast("long").alias("x"),
        # divisor in {-2, -1, 1, 2}: map k%4 through a pinned CASE
        F.when(F.col("k") % 4 == 0, -2)
        .when(F.col("k") % 4 == 1, -1)
        .when(F.col("k") % 4 == 2, 1)
        .otherwise(2)
        .cast("long")
        .alias("y"),
    )
    out = vals.select(
        "k",
        "x",
        "y",
        (F.col("x") / F.col("y")).alias("true_div"),
        F.expr("div(x, y)").cast("long").alias("int_div"),
        (F.col("x") % F.col("y")).cast("long").alias("mod_dividend_sign"),
        F.pmod(F.col("x"), F.col("y")).cast("long").alias("pmod_pos"),
        F.floor(F.col("x") / F.col("y")).cast("long").alias("floor_div"),
    )
    return out.orderBy("k").limit(100)


Q_DIVMOD_SQL = """
WITH vals AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 13 - 6 AS BIGINT) AS x,
         CAST(CASE o_orderkey % 4 WHEN 0 THEN -2 WHEN 1 THEN -1
                                  WHEN 2 THEN 1 ELSE 2 END AS BIGINT) AS y
  FROM orders)
SELECT k, x, y,
       x / CAST(y AS DOUBLE) AS true_div,
       CAST(x // y AS BIGINT) AS int_div,
       CAST(x % y AS BIGINT) AS mod_dividend_sign,
       CAST(CASE WHEN x % y < 0 THEN ((x % y) + y) % y
                 ELSE x % y END AS BIGINT) AS pmod_pos,
       CAST(FLOOR(x / CAST(y AS DOUBLE)) AS BIGINT) AS floor_div
FROM vals ORDER BY k LIMIT 100
"""

QUERIES["q_division_modulo_pins"] = QuerySpec(
    q_division_modulo_pins,
    Q_DIVMOD_SQL,
    "negative-operand division/modulo pins: truncating div, dividend-"
    "sign mod, divisor-sign pmod, floor div — one semantics, both dialects",
)


def q_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    d = ((F.col("k") % 1000) - 500) / 7.0
    vals = orders.select(
        "k",
        F.round(d, 6).alias("d"),
        F.concat(F.lit("  "), (F.col("k") % 997).cast("string"), F.lit(" ")).alias(
            "s"
        ),
    )
    out = vals.select(
        "k",
        "d",
        # Spark CAST(double AS INT) truncates toward zero (the oracle
        # must TRUNC() first — DuckDB's bare CAST rounds half-even)
        F.col("d").cast("long").alias("cast_trunc"),
        F.round("d", 0).cast("long").alias("round_then_cast"),
        F.ceil("d").cast("long").alias("ceil_i"),
        F.floor("d").cast("long").alias("floor_i"),
        F.trim(F.col("s")).cast("long").alias("str_to_int"),
        F.expr("try_cast(concat(s, 'x') AS BIGINT)").alias("bad_cast_null"),
    )
    return out.orderBy("k").limit(100)


Q_CAST_SQL = """
WITH vals AS (
  SELECT o_orderkey AS k,
         ROUND((o_orderkey % 1000 - 500) / 7.0, 6) AS d,
         '  ' || CAST(o_orderkey % 997 AS VARCHAR) || ' ' AS s
  FROM orders)
SELECT k, d,
       CAST(TRUNC(d) AS BIGINT) AS cast_trunc,
       CAST(ROUND(d, 0) AS BIGINT) AS round_then_cast,
       CAST(CEIL(d) AS BIGINT) AS ceil_i,
       CAST(FLOOR(d) AS BIGINT) AS floor_i,
       CAST(TRIM(s) AS BIGINT) AS str_to_int,
       TRY_CAST(s || 'x' AS BIGINT) AS bad_cast_null
FROM vals ORDER BY k LIMIT 100
"""

QUERIES["q_cast_matrix"] = QuerySpec(
    q_cast_matrix,
    Q_CAST_SQL,
    "cast-semantics matrix: truncating double->int (oracle TRUNCs to "
    "match), round/ceil/floor, whitespace strings, failing try_cast",
)


def q_date_edge_pins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.to_date("o_orderdate").alias("d")
    )
    eom = F.last_day(F.col("d"))

    def ep(c):
        return F.unix_timestamp(c.cast("timestamp")).cast("long")

    out = orders.select(
        "k",
        ep(F.col("d")).alias("d_epoch"),
        ep(eom).alias("eom_epoch"),
        # add_months clamps to the target month's end
        ep(F.add_months(eom, 1)).alias("eom_plus_month"),
        ep(F.date_add(eom, 30)).alias("eom_plus_30d"),
        ep(F.date_trunc("week", F.col("d")).cast("date")).alias("week_monday"),
        # next Monday strictly after d (emulated identically both sides)
        ep(F.date_add(F.date_trunc("week", F.col("d")).cast("date"), 7)).alias(
            "next_monday"
        ),
        F.datediff(eom, F.col("d")).cast("int").alias("days_to_eom"),
    )
    return out.orderBy("k").limit(100)


# DuckDB's `date + INTERVAL 1 MONTH` clamps like add_months, but the
# result type is TIMESTAMP; cast back.
Q_DATE_SQL = """
WITH o AS (
  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT k,
       CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) AS d_epoch,
       CAST(epoch(CAST(last_day(d) AS TIMESTAMP)) AS BIGINT) AS eom_epoch,
       CAST(epoch(CAST(last_day(d) + INTERVAL 1 MONTH AS TIMESTAMP))
            AS BIGINT) AS eom_plus_month,
       CAST(epoch(CAST(last_day(d) + 30 AS TIMESTAMP))
            AS BIGINT) AS eom_plus_30d,
       CAST(epoch(CAST(date_trunc('week', d) AS TIMESTAMP)) AS BIGINT)
           AS week_monday,
       CAST(epoch(CAST(CAST(date_trunc('week', d) AS DATE) + 7 AS TIMESTAMP))
            AS BIGINT) AS next_monday,
       CAST(date_diff('day', d, last_day(d)) AS INT) AS days_to_eom
FROM o ORDER BY k LIMIT 100
"""

QUERIES["q_date_edge_pins"] = QuerySpec(
    q_date_edge_pins,
    Q_DATE_SQL,
    "date-edge pins: LAST_DAY, month-end-clamped add_months, Monday "
    "week truncation, emulated next-Monday",
)

"""Round-10 surface extensions, batch AX (SURVEY §2.3 N r10): the
scalar-surface completion block — the regexp position family
(regexp_instr / regexp_substr / regexp_count / rlike), the fractional
month-arithmetic family (months_between with Spark's 31-day rule,
next_day, make_date), and the remaining string/binary builtins
(initcap, overlay, left/right, hex/unhex, base64/unbase64,
octet_length vs char length on multi-byte input). Where DuckDB lacks
the builtin (initcap, overlay, months_between, next_day) the oracle
SPELLS OUT the semantics — the strongest form of pin.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: string/integer outputs only.
Scale: per-row scalar expressions riding one scan; zero shuffles
beyond the final orderBy for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------ regexp position family


def q_regexp_instr_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.regexp_instr(F.col("p_name"), F.lit("[aeiou]{2}")).alias("vowel_pair_pos"),
        F.regexp_substr(F.col("p_name"), F.lit("[aeiou]{2}")).alias("vowel_pair"),
        F.regexp_count(F.col("p_name"), F.lit(" ")).alias("n_spaces"),
        F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
    ).orderBy("p_partkey")


Q_REGEXP2_SQL = """
SELECT p_partkey,
       CASE WHEN regexp_extract(p_name, '[aeiou]{2}', 0) = ''
            THEN 0
            ELSE strpos(p_name, regexp_extract(p_name, '[aeiou]{2}', 0)) END
           AS vowel_pair_pos,
       CASE WHEN regexp_extract(p_name, '[aeiou]{2}', 0) = ''
            THEN NULL
            ELSE regexp_extract(p_name, '[aeiou]{2}', 0) END AS vowel_pair,
       CAST(length(p_name) - length(replace(p_name, ' ', '')) AS INT) AS n_spaces,
       regexp_matches(p_name, '^[a-z]+ ') AS starts_word
FROM part WHERE p_partkey <= 200
ORDER BY p_partkey
"""

QUERIES["q_regexp_instr_substr"] = QuerySpec(
    q_regexp_instr_substr,
    Q_REGEXP2_SQL,
    "regexp_instr/substr/count + rlike surface — oracle derives the "
    "position from first-match extraction",
)


# ------------------------------------------- fractional month arithmetic
# Spark months_between(d1, d2): whole months if both are the same
# day-of-month (or both month-ends), else months + (day1-day2)/31
# (time-of-day ignored here: inputs are day-truncated). The oracle
# reproduces exactly that documented rule.


def q_months_between_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("ship")
    )
    j = orders.join(first_ship, "o_orderkey")
    return j.select(
        "o_orderkey",
        F.round(
            F.months_between(F.to_date("ship"), F.to_date("o_orderdate")), 6
        ).alias("months_to_ship"),
        F.unix_timestamp(F.next_day(F.to_date("o_orderdate"), "Mon")).alias(
            "next_monday_epoch"
        ),
        F.unix_timestamp(
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1))
        ).alias("month_start_epoch"),
    ).orderBy("o_orderkey")


Q_MONTHS_SQL = """
WITH first_ship AS (
  SELECT l_orderkey AS o_orderkey, MIN(l_shipdate) AS ship
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d1, CAST(ship AS DATE) AS d2
  FROM orders JOIN first_ship USING (o_orderkey)
  WHERE o_orderkey <= 500)
SELECT o_orderkey,
       ROUND(CASE
         WHEN day(d2) = day(d1)
              OR (d2 = last_day(d2) AND d1 = last_day(d1))
         THEN CAST((year(d2) - year(d1)) * 12 + (month(d2) - month(d1)) AS DOUBLE)
         ELSE (year(d2) - year(d1)) * 12 + (month(d2) - month(d1))
              + (day(d2) - day(d1)) / 31.0
       END, 6) AS months_to_ship,
       CAST(epoch(d1 + INTERVAL 1 DAY * ((6 - (dayofweek(d1) + 6) % 7) % 7 + 1))
            AS BIGINT) AS next_monday_epoch,
       CAST(epoch(make_date(year(d1), month(d1), 1)) AS BIGINT)
           AS month_start_epoch
FROM j
ORDER BY o_orderkey
"""

QUERIES["q_months_between_family"] = QuerySpec(
    q_months_between_family,
    Q_MONTHS_SQL,
    "months_between 31-day rule + next_day + make_date — oracle "
    "reproduces Spark's documented month-arithmetic semantics",
)


# ------------------------------------------- string/binary builtins II


def q_string_builtins2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    accented = F.concat(F.col("p_brand"), F.lit("é"))
    return part.select(
        "p_partkey",
        F.initcap(F.col("p_name")).alias("title_name"),
        F.overlay(F.col("p_brand"), F.lit("XX"), 2, 2).alias("brand_patched"),
        F.substring(F.col("p_name"), 1, 3).alias("l3"),
        F.substring(F.col("p_name"), -3, 3).alias("r3"),
        F.hex(F.col("p_brand").cast("binary")).alias("brand_hex"),
        F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"),
        F.unbase64(F.base64(F.col("p_brand").cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
        F.octet_length(accented).alias("bytes_accented"),
        F.length(accented).alias("chars_accented"),
    ).orderBy("p_partkey")


Q_STRING2_SQL = """
SELECT p_partkey,
       array_to_string(list_transform(string_split(p_name, ' '),
                       w -> upper(w[1]) || lower(w[2:])), ' ') AS title_name,
       substr(p_brand, 1, 1) || 'XX' || substr(p_brand, 4) AS brand_patched,
       substr(p_name, 1, 3) AS l3,
       substr(p_name, length(p_name) - 2, 3) AS r3,
       upper(hex(encode(p_brand))) AS brand_hex,
       base64(encode(p_brand)) AS brand_b64,
       CAST(from_base64(base64(encode(p_brand))) AS VARCHAR) AS b64_roundtrip,
       CAST(octet_length(encode(p_brand || chr(233))) AS INT) AS bytes_accented,
       CAST(length(p_brand || chr(233)) AS INT) AS chars_accented
FROM part WHERE p_partkey <= 200
ORDER BY p_partkey
"""

QUERIES["q_string_builtins2"] = QuerySpec(
    q_string_builtins2,
    Q_STRING2_SQL,
    "initcap/overlay/left/right/hex/base64/octet_length surface — "
    "oracle spells out initcap and overlay semantics",
)

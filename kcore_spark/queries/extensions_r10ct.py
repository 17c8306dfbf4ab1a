"""Round-10 surface extensions, batch CT (SURVEY §2.3 N r10): the
bit-and-format scalar surface — bitwise AGGREGATES (bit_and / bit_or /
bit_xor over per-priority key masks: the dialect corner warehouses use
for permission masks and bloom words), the bit-shift scalar family
(shifts, masks, xor mixing, popcount — the building blocks the hashing
queries assume), and C-style printf formatting (zero-padded decimal,
hex, literal pipes — Spark format_string vs DuckDB printf must agree
byte-for-byte). Completes §2.3 H next to q_string_builtins2 /
q_math_funcs / q_try_arithmetic.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all inputs are integer keys; every output is an integer
or an exact string.
Scale: pure expression pins riding one scan, keyed group-bys or
fully-tie-broken LIMITs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_bitwise_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_orderkey") % 4096).alias("mask"),
    )
    return (
        orders.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("bit_and(mask)").cast("long").alias("all_bits"),
            F.expr("bit_or(mask)").cast("long").alias("any_bits"),
            F.expr("bit_xor(mask)").cast("long").alias("xor_bits"),
            F.sum(F.bit_count(F.col("mask"))).cast("long").alias("total_pop"),
        )
        .orderBy("grp")
    )


Q_BITAGG_SQL = """
SELECT o_orderpriority AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(BIT_AND(o_orderkey % 4096) AS BIGINT) AS all_bits,
       CAST(BIT_OR(o_orderkey % 4096) AS BIGINT) AS any_bits,
       CAST(BIT_XOR(o_orderkey % 4096) AS BIGINT) AS xor_bits,
       CAST(SUM(bit_count(CAST(o_orderkey % 4096 AS BIGINT))) AS BIGINT)
           AS total_pop
FROM orders
GROUP BY 1 ORDER BY grp
"""

QUERIES["q_bitwise_aggregates"] = QuerySpec(
    q_bitwise_aggregates,
    Q_BITAGG_SQL,
    "bit_and/bit_or/bit_xor aggregates + popcount sum over key masks — "
    "exact integer dialect pin",
)


def q_bit_shift_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    mixed = orders.select(
        "k",
        F.expr("shiftleft(k, 3)").cast("long").alias("shl3"),
        F.expr("shiftright(k, 2)").cast("long").alias("shr2"),
        (
            (F.expr("shiftleft(k, 5)") + F.col("k"))
            .bitwiseXOR(F.expr("shiftright(k, 7)"))
            % 65536
        )
        .cast("long")
        .alias("mix16"),
        F.bit_count((F.col("k") % 256).cast("long")).cast("int").alias("pop8"),
        (F.col("k").bitwiseAND(F.lit(255))).cast("long").alias("low8"),
        (F.col("k").bitwiseOR(F.lit(4096))).cast("long").alias("with_bit12"),
    )
    return mixed.orderBy("k").limit(100)


Q_BITSHIFT_SQL = """
SELECT o_orderkey AS k,
       CAST(o_orderkey << 3 AS BIGINT) AS shl3,
       CAST(o_orderkey >> 2 AS BIGINT) AS shr2,
       CAST(xor((o_orderkey << 5) + o_orderkey, o_orderkey >> 7) % 65536
            AS BIGINT) AS mix16,
       CAST(bit_count(CAST(o_orderkey % 256 AS BIGINT)) AS INT) AS pop8,
       CAST(o_orderkey & 255 AS BIGINT) AS low8,
       CAST(o_orderkey | 4096 AS BIGINT) AS with_bit12
FROM orders
ORDER BY k LIMIT 100
"""

QUERIES["q_bit_shift_family"] = QuerySpec(
    q_bit_shift_family,
    Q_BITSHIFT_SQL,
    "shift/mask/xor-mix/popcount scalar pins on order keys — the "
    "hash-building-block surface",
)


def q_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    out = orders.select(
        "k",
        F.format_string("%08d", F.col("k")).alias("padded"),
        F.format_string("%x", F.col("k")).alias("hex_lower"),
        F.format_string("ORD-%05d/%s", F.col("k") % 100000,
                        F.substring("o_orderpriority", 1, 1)).alias("label"),
        F.lpad(F.col("k").cast("string"), 12, "*").alias("starred"),
        F.repeat(F.lit("ab"), (F.col("k") % 3 + 1).cast("int")).alias("rep"),
        F.reverse(F.col("k").cast("string")).alias("rev"),
    )
    return out.orderBy("k").limit(100)


Q_FORMAT_SQL = """
SELECT o_orderkey AS k,
       printf('%08d', o_orderkey) AS padded,
       printf('%x', o_orderkey) AS hex_lower,
       printf('ORD-%05d/%s', o_orderkey % 100000,
              substring(o_orderpriority, 1, 1)) AS label,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '*') AS starred,
       repeat('ab', CAST(o_orderkey % 3 + 1 AS INT)) AS rep,
       reverse(CAST(o_orderkey AS VARCHAR)) AS rev
FROM orders
ORDER BY k LIMIT 100
"""

QUERIES["q_format_strings"] = QuerySpec(
    q_format_strings,
    Q_FORMAT_SQL,
    "printf/lpad/repeat/reverse formatting pins — byte-identical "
    "strings across dialects",
)

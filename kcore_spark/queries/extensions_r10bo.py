"""Round-10 surface extensions, batch BO (SURVEY §2.3 N r10): the
physical-design advisor block — a column encoding advisor (NDV
ratio + width → dictionary/RLE/plain recommendation, the parquet
tuning table next to q_row_width_planner), a Bloom filter sizing
advisor (optimal bits and hash count for target FPPs from the
measured key NDV — the design-time companion to q_bloom_fpp's
measured filter), and a sort-key / zone-map advisor (per candidate
column: expected fraction of write-order buckets a point lookup can
prune, from per-bucket min/max spans — the q_zorder family's 1-D
planning input).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer NDV/width sums; bucket spans from integer
arithmetic on the write-order key; literal FPP grid.
Scale: one grouped agg per advisor; bucket stats are a 32-row
rollup; no sorts or windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------- encoding advisor
# Per candidate column: NDV ratio and average encoded width; rec =
# dictionary (ndv_ratio < 0.01), rle (< 0.1), else plain.

_ENC_COLS = ["l_returnflag", "l_linestatus", "l_shipmode_sim", "l_orderkey_str"]


def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.concat(F.lit("MODE_"), (F.col("l_suppkey") % 7).cast("string")).alias(
            "l_shipmode_sim"
        ),
        F.col("l_orderkey").cast("string").alias("l_orderkey_str"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in _ENC_COLS:
        aggs.append(F.countDistinct(c).alias(f"ndv_{c}"))
        aggs.append(F.sum(F.length(c)).alias(f"w_{c}"))
    m = li.agg(*aggs)
    rows = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"ndv_{c}").cast("long").alias("ndv"),
                        F.round(
                            F.col(f"ndv_{c}").cast("double")
                            / F.col("n").cast("double"),
                            6,
                        ).alias("ndv_ratio"),
                        F.round(
                            F.col(f"w_{c}").cast("double") / F.col("n").cast("double"),
                            4,
                        ).alias("avg_width"),
                    )
                    for c in _ENC_COLS
                ]
            )
        ).alias("g")
    )
    return rows.select(
        F.col("g.column_name").alias("column_name"),
        F.col("g.ndv").alias("ndv"),
        F.col("g.ndv_ratio").alias("ndv_ratio"),
        F.col("g.avg_width").alias("avg_width"),
        F.when(F.col("g.ndv_ratio") < 0.01, "dictionary")
        .when(F.col("g.ndv_ratio") < 0.1, "rle")
        .otherwise("plain")
        .alias("recommendation"),
    ).orderBy("column_name")


def _enc_sql_row(c: str) -> str:
    return (
        f"SELECT '{c}' AS column_name, CAST(ndv_{c} AS BIGINT) AS ndv, "
        f"ROUND(CAST(ndv_{c} AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ndv_ratio, "
        f"ROUND(CAST(w_{c} AS DOUBLE) / CAST(n AS DOUBLE), 4) AS avg_width, "
        f"CASE WHEN CAST(ndv_{c} AS DOUBLE) / CAST(n AS DOUBLE) < 0.01 THEN 'dictionary' "
        f"WHEN CAST(ndv_{c} AS DOUBLE) / CAST(n AS DOUBLE) < 0.1 THEN 'rle' "
        f"ELSE 'plain' END AS recommendation FROM m"
    )


Q_ENCODING_SQL = (
    """
WITH src AS (
  SELECT l_returnflag, l_linestatus,
         'MODE_' || CAST(l_suppkey % 7 AS VARCHAR) AS l_shipmode_sim,
         CAST(l_orderkey AS VARCHAR) AS l_orderkey_str
  FROM lineitem),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, """
    + ", ".join(
        f"COUNT(DISTINCT {c}) AS ndv_{c}, SUM(length({c})) AS w_{c}"
        for c in _ENC_COLS
    )
    + " FROM src)\n"
    + "\nUNION ALL ".join(_enc_sql_row(c) for c in _ENC_COLS)
    + "\nORDER BY column_name"
)

QUERIES["q_encoding_advisor"] = QuerySpec(
    q_encoding_advisor,
    Q_ENCODING_SQL,
    "column encoding advisor (NDV ratio + width -> dict/rle/plain) — "
    "one wide distinct-count aggregate, 4-row unpivot",
)


# ---------------------------------------------- Bloom size advisor
# m = ceil(−n·ln p / ln2²), k = round(m/n·ln2) for p ∈ {1e-2, 1e-3,
# 1e-4}, n = measured NDV of the join key.

_FPPS = [0.01, 0.001, 0.0001]
_LN2_SQ = 0.4804530139182014
_LN2 = 0.6931471805599453


def q_bloom_size_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = li.agg(F.countDistinct("l_partkey").cast("long").alias("ndv"))
    rows = n.select(
        "ndv",
        F.explode(F.array(*[F.lit(p) for p in _FPPS])).alias("fpp"),
    )
    m_bits = F.ceil(
        -F.col("ndv").cast("double") * F.log(F.col("fpp")) / _LN2_SQ
    ).cast("long")
    k = F.round(
        m_bits.cast("double") / F.col("ndv").cast("double") * _LN2, 0
    ).cast("long")
    return rows.select(
        "ndv",
        F.col("fpp"),
        m_bits.alias("bits"),
        F.round(m_bits.cast("double") / 8388608.0, 4).alias("mb"),
        k.alias("hashes"),
    ).orderBy(F.col("fpp").desc())


Q_BLOOM_ADVISOR_SQL = f"""
WITH n AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv FROM lineitem),
grid AS (SELECT UNNEST([{", ".join(str(p) for p in _FPPS)}]) AS fpp)
SELECT ndv, fpp,
       CAST(CEIL(-CAST(ndv AS DOUBLE) * LN(fpp) / {_LN2_SQ}) AS BIGINT) AS bits,
       ROUND(CEIL(-CAST(ndv AS DOUBLE) * LN(fpp) / {_LN2_SQ}) / 8388608.0, 4) AS mb,
       CAST(ROUND(CEIL(-CAST(ndv AS DOUBLE) * LN(fpp) / {_LN2_SQ})
                  / CAST(ndv AS DOUBLE) * {_LN2}, 0) AS BIGINT) AS hashes
FROM n CROSS JOIN grid
ORDER BY fpp DESC
"""

QUERIES["q_bloom_size_advisor"] = QuerySpec(
    q_bloom_size_advisor,
    Q_BLOOM_ADVISOR_SQL,
    "Bloom filter sizing at a target-FPP grid from the measured key "
    "NDV — closed-form bits/hashes",
)


# ------------------------------------------- sort-key / zone-map advisor
# 32 write-order buckets (orderkey ranges); per candidate column the
# expected prune fraction for a uniform point lookup:
#   1 − avg_bucket((max−min)/(global_max−global_min)).


def q_sort_key_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 32).alias("bucket"),
        F.col("l_partkey").cast("double").alias("c_partkey"),
        F.col("l_extendedprice").cast("double").alias("c_price"),
        F.unix_timestamp("l_shipdate").cast("double").alias("c_shipdate"),
    )
    cands = ["c_partkey", "c_price", "c_shipdate"]
    per_bucket = li.groupBy("bucket").agg(
        *[F.min(c).alias(f"lo_{c}") for c in cands],
        *[F.max(c).alias(f"hi_{c}") for c in cands],
    )
    glob = li.agg(
        *[F.min(c).alias(f"glo_{c}") for c in cands],
        *[F.max(c).alias(f"ghi_{c}") for c in cands],
    )
    j = per_bucket.crossJoin(F.broadcast(glob))
    aggs = []
    for c in cands:
        span = (F.col(f"hi_{c}") - F.col(f"lo_{c}")) / (
            F.col(f"ghi_{c}") - F.col(f"glo_{c}")
        )
        aggs.append(
            (
                F.sum(F.round(span, 9).cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias(f"span_{c}")
        )
    m = j.agg(F.count(F.lit(1)).cast("long").alias("n_buckets"), *aggs)
    rows = m.select(
        "n_buckets",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("candidate"),
                        F.round(1.0 - F.col(f"span_{c}"), 6).alias("prune_score"),
                    )
                    for c in cands
                ]
            )
        ).alias("g"),
    )
    return rows.select(
        F.col("g.candidate").alias("candidate"),
        "n_buckets",
        F.col("g.prune_score").alias("prune_score"),
    ).orderBy("candidate")


def _ska_sql(cands: list) -> str:
    per = ", ".join(f"MIN({c}) AS lo_{c}, MAX({c}) AS hi_{c}" for c in cands)
    gl = ", ".join(f"MIN({c}) AS glo_{c}, MAX({c}) AS ghi_{c}" for c in cands)
    spans = ", ".join(
        f"CAST(SUM(CAST(ROUND((hi_{c} - lo_{c}) / (ghi_{c} - glo_{c}), 9)"
        f" AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS span_{c}"
        for c in cands
    )
    rows = "\nUNION ALL ".join(
        f"SELECT '{c}' AS candidate, n_buckets, ROUND(1.0 - span_{c}, 6)"
        f" AS prune_score FROM m"
        for c in cands
    )
    return f"""
WITH src AS (
  SELECT l_orderkey % 32 AS bucket,
         CAST(l_partkey AS DOUBLE) AS c_partkey,
         CAST(l_extendedprice AS DOUBLE) AS c_price,
         CAST(epoch(date_trunc('second', CAST(l_shipdate AS TIMESTAMP))) AS DOUBLE)
             AS c_shipdate
  FROM lineitem),
per_bucket AS (SELECT bucket, {per} FROM src GROUP BY bucket),
grange AS (SELECT {gl} FROM src),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets, {spans}
  FROM per_bucket CROSS JOIN grange)
{rows}
ORDER BY candidate
"""


Q_SORT_KEY_SQL = _ska_sql(["c_partkey", "c_price", "c_shipdate"])

QUERIES["q_sort_key_advisor"] = QuerySpec(
    q_sort_key_advisor,
    Q_SORT_KEY_SQL,
    "zone-map prune scores per candidate sort key over write-order "
    "buckets — 32-row span rollup, 3-row advisory",
)

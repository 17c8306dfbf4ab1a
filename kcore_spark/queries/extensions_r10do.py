"""Round-10 surface extensions, batch DO (SURVEY §2.3 N r10): the
approximate-query-processing audit block — what a 10% md5 sample costs
in accuracy, measured against exact answers inside one query. Sampled
GROUP BY error (scaled group counts vs exact, per-group relative
error), sampled quantile error (P50/P90 of order value from the sample
vs the exact cents-domain walk), and sampled top-k overlap (does the
sample's top-10 brand list match the exact one?). The empirical
go/no-go table for sampling a dashboard; sibling of
q_sample_pair_estimate / q_hash_sample / q_approx_distinct_check.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the sample is md5-pinned; quantiles are exact
distinct-value walks on integer cents (both populations); top-k lists
fully tie-broken.
Scale: one scan per population; quantile walks ride the value-domain
tie tables (adjudicated); top-k lists are k-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_RATE = 10  # keep 1-in-10


def _sampled(col: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("aqp-"), col.cast("string"))), 1, 8), 16, 10)
        % _RATE
        == 0
    )


_SAMPLED_SQL = (
    "(('0x' || substring(md5('aqp-' || CAST({k} AS VARCHAR)), 1, 8))::BIGINT"
    f" % {_RATE} = 0)"
)


def q_sample_groupby_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        _sampled(F.col("o_orderkey")).alias("s"),
    )
    per = orders.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n"),
        (F.sum(F.col("s").cast("long")) * _RATE).cast("long").alias("est_n"),
    )
    return per.select(
        "grp",
        "exact_n",
        "est_n",
        F.round(
            F.abs(F.col("est_n") - F.col("exact_n"))
            / F.col("exact_n").cast("double"),
            6,
        ).alias("rel_error"),
    ).orderBy("grp")


Q_GBERR_SQL = f"""
SELECT o_orderpriority AS grp,
       CAST(COUNT(*) AS BIGINT) AS exact_n,
       CAST(SUM(CASE WHEN {_SAMPLED_SQL.format(k="o_orderkey")}
                THEN 1 ELSE 0 END) * {_RATE} AS BIGINT) AS est_n,
       ROUND(ABS(SUM(CASE WHEN {_SAMPLED_SQL.format(k="o_orderkey")}
                     THEN 1 ELSE 0 END) * {_RATE} - COUNT(*))
             / CAST(COUNT(*) AS DOUBLE), 6) AS rel_error
FROM orders GROUP BY 1 ORDER BY grp
"""

QUERIES["q_sample_groupby_error"] = QuerySpec(
    q_sample_groupby_error,
    Q_GBERR_SQL,
    "10%-sample GROUP BY error per priority: scaled estimate vs exact "
    "count — one scan, md5-pinned sample",
)


def _quantiles(df: DataFrame, tag: str) -> DataFrame:
    """Exact P50/P90 of the cents column via the distinct-value walk.
    The distinct-cents table is ORDER-count-sized (149,743 at sf0.1,
    10.0x per 10x data — r12 bounded-domain probe), so the cumulative
    walk runs on _dist_cumsum, not a global window."""
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    vals = df.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cum = _dist_cumsum(vals, [F.col("cents")], "c", out_col="cum").crossJoin(
        F.broadcast(tot)
    )
    p50 = cum.where(F.col("cum") * 2 >= F.col("n")).agg(
        F.min("cents").alias(f"p50_{tag}")
    )
    p90 = cum.where(F.col("cum") * 10 >= F.col("n") * 9).agg(
        F.min("cents").alias(f"p90_{tag}")
    )
    return p50.crossJoin(F.broadcast(p90))


def q_sample_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        _sampled(F.col("o_orderkey")).alias("s"),
    )
    exact = _quantiles(orders, "exact")
    samp = _quantiles(orders.where(F.col("s")), "sample")
    j = exact.crossJoin(F.broadcast(samp))
    return j.select(
        F.round(F.col("p50_exact") / 100.0, 2).alias("p50_exact"),
        F.round(F.col("p50_sample") / 100.0, 2).alias("p50_sample"),
        F.round(
            F.abs(F.col("p50_sample") - F.col("p50_exact"))
            / F.col("p50_exact").cast("double"),
            6,
        ).alias("p50_rel_error"),
        F.round(F.col("p90_exact") / 100.0, 2).alias("p90_exact"),
        F.round(F.col("p90_sample") / 100.0, 2).alias("p90_sample"),
        F.round(
            F.abs(F.col("p90_sample") - F.col("p90_exact"))
            / F.col("p90_exact").cast("double"),
            6,
        ).alias("p90_rel_error"),
    )


def _q_sql(src: str, tag: str) -> str:
    return f"""
  vals_{tag} AS (
    SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM {src} GROUP BY cents),
  tot_{tag} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {src}),
  cum_{tag} AS (
    SELECT cents, SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
           n
    FROM vals_{tag} CROSS JOIN tot_{tag}),
  p50_{tag} AS (SELECT MIN(cents) AS p50 FROM cum_{tag} WHERE cum * 2 >= n),
  p90_{tag} AS (SELECT MIN(cents) AS p90 FROM cum_{tag} WHERE cum * 10 >= n * 9)
"""


Q_QERR_SQL = f"""
WITH base AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         {_SAMPLED_SQL.format(k="o_orderkey")} AS s
  FROM orders),
samp AS (SELECT cents FROM base WHERE s),
{_q_sql("base", "e")},
{_q_sql("samp", "s")}
SELECT ROUND(p50_e.p50 / 100.0, 2) AS p50_exact,
       ROUND(p50_s.p50 / 100.0, 2) AS p50_sample,
       ROUND(ABS(p50_s.p50 - p50_e.p50) / CAST(p50_e.p50 AS DOUBLE), 6)
           AS p50_rel_error,
       ROUND(p90_e.p90 / 100.0, 2) AS p90_exact,
       ROUND(p90_s.p90 / 100.0, 2) AS p90_sample,
       ROUND(ABS(p90_s.p90 - p90_e.p90) / CAST(p90_e.p90 AS DOUBLE), 6)
           AS p90_rel_error
FROM p50_e CROSS JOIN p50_s CROSS JOIN p90_e CROSS JOIN p90_s
"""

QUERIES["q_sample_quantile_error"] = QuerySpec(
    q_sample_quantile_error,
    Q_QERR_SQL,
    "10%-sample P50/P90 error vs exact — two distinct-value walks on "
    "the cents domain",
)


def q_sample_topk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("p_brand", "cents", _sampled(F.col("l_orderkey")).alias("s"))
    )

    def topk(df: DataFrame, col: str) -> DataFrame:
        per = df.groupBy("p_brand").agg(
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("rev")
        )
        return per.orderBy(F.col("rev").desc(), "p_brand").limit(10).select(
            F.col("p_brand").alias(col)
        )

    exact = topk(rev, "brand_e")
    samp = topk(rev.where(F.col("s")), "brand_s")
    j = exact.join(samp, exact.brand_e == samp.brand_s, "full_outer")
    return j.agg(
        F.sum(
            (F.col("brand_e").isNotNull() & F.col("brand_s").isNotNull()).cast(
                "long"
            )
        ).alias("overlap"),
        F.round(
            F.sum(
                (
                    F.col("brand_e").isNotNull() & F.col("brand_s").isNotNull()
                ).cast("long")
            )
            / 10.0,
            6,
        ).alias("overlap_at_10"),
    )


Q_TOPK_SQL = f"""
WITH rev AS (
  SELECT p_brand,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         {_SAMPLED_SQL.format(k="l_orderkey")} AS s
  FROM lineitem JOIN part ON l_partkey = p_partkey),
exact AS (
  SELECT p_brand AS brand_e FROM (
    SELECT p_brand, SUM(CAST(cents AS DECIMAL(38,0))) AS rev
    FROM rev GROUP BY 1)
  ORDER BY rev DESC, brand_e LIMIT 10),
samp AS (
  SELECT p_brand AS brand_s FROM (
    SELECT p_brand, SUM(CAST(cents AS DECIMAL(38,0))) AS rev
    FROM rev WHERE s GROUP BY 1)
  ORDER BY rev DESC, brand_s LIMIT 10)
SELECT CAST(SUM(CASE WHEN brand_e IS NOT NULL AND brand_s IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
       ROUND(SUM(CASE WHEN brand_e IS NOT NULL AND brand_s IS NOT NULL
                      THEN 1 ELSE 0 END) / 10.0, 6) AS overlap_at_10
FROM exact FULL OUTER JOIN samp ON brand_e = brand_s
"""

QUERIES["q_sample_topk_overlap"] = QuerySpec(
    q_sample_topk_overlap,
    Q_TOPK_SQL,
    "10%-sample top-10 brand list vs exact — overlap of two fully "
    "tie-broken k-row lists",
)

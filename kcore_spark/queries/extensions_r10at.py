"""Round-10 surface extensions, batch AT (SURVEY §2.3 N r10): the
sketch-estimator block, each measured AGAINST its exact ground truth
in the same row — the AMS (Alon-Matias-Szegedy) F2 sketch (second
frequency moment / self-join size from ±1 hash signs), the KMV
(k-minimum-values / bottom-k) distinct estimator, and linear
counting (bitmap-zeros distinct estimator). Completes the sketch
family next to HLL/theta/KLL/count-min/Bloom/minhash.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all hashing is md5-derived (the repo's pinned-uniform
idiom), so the sketches are exactly reproducible in both engines;
estimates and exacts are integer sums until the final ratios.
Scale: AMS is a 16× column fan-out collapsed by map-side partial
aggregation (one tiny shuffle of 16 rows); KMV is a distributed
top-k (sort+limit pushdown, no global sort materialization); linear
counting is one m-bucket groupBy. Exacts are single groupBy counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _u64(col, salt: str):
    """Pinned 32-bit uniform from md5(col || salt)."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("long")


# ------------------------------------------------------------ AMS F2
# 16 independent ±1 sign functions; S_j = Σ_rows sign_j(key);
# estimator_j = S_j²; estimate = mean of the 16. Exact F2 = Σ f(x)².


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")

    # bit j of a pinned 16-bit hash decides the sign for estimator j
    # (FLOOR in both engines: DuckDB's bigint cast rounds, Spark's
    # truncates). All 16 sign sums are parallel aggregate expressions
    # over ONE scan — no row fan-out (16x cheaper than the explode
    # form; measured 8.2s -> ~1s at sf0.1).
    def _sj(j: int):
        bit = (
            F.floor(
                (_u64(F.col("l_partkey"), "ams") % 65536) / float(2**j)
            ).cast("long")
            % 2
        )
        sign = F.when(bit == 0, 1).otherwise(-1)
        return F.sum(sign).alias(f"s{j}")

    wide = li.agg(*[_sj(j) for j in range(16)])
    est = wide.select(
        (
            sum(F.col(f"s{j}") * F.col(f"s{j}") for j in range(16))
            / F.lit(16)
        ).alias("f2_est")
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).alias("f2_exact"))
    )
    return est.crossJoin(exact).select(
        F.round("f2_est", 2).alias("f2_estimate"),
        F.col("f2_exact").cast("long").alias("f2_exact"),
        F.round(F.col("f2_est") / F.col("f2_exact").cast("double"), 6).alias(
            "est_over_exact"
        ),
    )


Q_AMS_SQL = """
WITH fanout AS (
  SELECT l_partkey, j FROM lineitem
  CROSS JOIN (SELECT UNNEST(range(0, 16)) AS j) t),
per_j AS (
  SELECT j, SUM(CASE WHEN CAST(FLOOR((('0x' || substring(md5(CAST(l_partkey AS VARCHAR) || 'ams'), 1, 8))::BIGINT % 65536)
                          / POWER(2.0, CAST(j AS DOUBLE))) AS BIGINT) % 2 = 0
                     THEN 1 ELSE -1 END) AS s
  FROM fanout GROUP BY j),
est AS (SELECT SUM(s * s) / COUNT(*) AS f2_est FROM per_j),
exact AS (
  SELECT SUM(f * f) AS f2_exact
  FROM (SELECT COUNT(*) AS f FROM lineitem GROUP BY l_partkey))
SELECT ROUND(f2_est, 2) AS f2_estimate,
       CAST(f2_exact AS BIGINT) AS f2_exact,
       ROUND(f2_est / CAST(f2_exact AS DOUBLE), 6) AS est_over_exact
FROM est CROSS JOIN exact
"""

QUERIES["q_ams_f2"] = QuerySpec(
    q_ams_f2,
    Q_AMS_SQL,
    "AMS second-frequency-moment sketch (16 pinned ±1 estimators) vs "
    "exact self-join size — map-side-collapsed fan-out",
)


# ------------------------------------------------------ KMV distinct
# k = 64 minimum normalized hash values over distinct keys; estimate
# = (k−1)/h_(k). Distributed top-k via sort+limit pushdown.


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    h = (_u64(F.col("l_partkey"), "kmv").cast("double") / F.lit(4294967296.0)).alias(
        "h"
    )
    k = 64
    bottom = li.select(h).orderBy("h").limit(k)
    kth = bottom.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("k"))
    exact = li.agg(F.count(F.lit(1)).cast("long").alias("d_exact"))
    return kth.crossJoin(exact).select(
        F.col("k").cast("long").alias("k"),
        F.round((F.col("k") - 1).cast("double") / F.col("hk"), 2).alias("d_estimate"),
        "d_exact",
        F.round(
            (F.col("k") - 1).cast("double")
            / F.col("hk")
            / F.col("d_exact").cast("double"),
            6,
        ).alias("est_over_exact"),
    )


Q_KMV_SQL = """
WITH dk AS (SELECT DISTINCT l_partkey FROM lineitem),
hashes AS (
  SELECT ('0x' || substring(md5(CAST(l_partkey AS VARCHAR) || 'kmv'), 1, 8))::BIGINT
         / 4294967296.0 AS h
  FROM dk),
bottom AS (SELECT h FROM hashes ORDER BY h LIMIT 64),
kth AS (SELECT MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS k FROM bottom),
exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_exact FROM dk)
SELECT k,
       ROUND(CAST(k - 1 AS DOUBLE) / hk, 2) AS d_estimate,
       d_exact,
       ROUND(CAST(k - 1 AS DOUBLE) / hk / CAST(d_exact AS DOUBLE), 6)
           AS est_over_exact
FROM kth CROSS JOIN exact
"""

QUERIES["q_kmv_distinct"] = QuerySpec(
    q_kmv_distinct,
    Q_KMV_SQL,
    "KMV (bottom-64) distinct estimator vs exact — distributed "
    "top-k, pinned hashes",
)


# -------------------------------------------------- linear counting
# m = 1024 buckets; V = empty buckets; estimate = −m·ln(V/m).


def q_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    m = 1024
    occupied = (
        li.select((_u64(F.col("l_partkey"), "lc") % m).alias("b"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    exact = li.distinct().agg(F.count(F.lit(1)).cast("long").alias("d_exact"))
    v = (F.lit(m) - F.col("occ")).cast("double") / F.lit(float(m))
    est = -F.lit(float(m)) * F.log(v)
    return occupied.crossJoin(exact).select(
        F.col("occ").cast("long").alias("occupied_buckets"),
        F.round(est, 2).alias("d_estimate"),
        "d_exact",
        F.round(est / F.col("d_exact").cast("double"), 6).alias("est_over_exact"),
    )


Q_LC_SQL = """
WITH occupied AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS occ
  FROM (SELECT DISTINCT ('0x' || substring(md5(CAST(l_partkey AS VARCHAR) || 'lc'), 1, 8))::BIGINT % 1024 AS b
        FROM lineitem)),
exact AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_exact FROM lineitem)
SELECT occ AS occupied_buckets,
       ROUND(-1024.0 * LN(CAST(1024 - occ AS DOUBLE) / 1024.0), 2) AS d_estimate,
       d_exact,
       ROUND(-1024.0 * LN(CAST(1024 - occ AS DOUBLE) / 1024.0)
             / CAST(d_exact AS DOUBLE), 6) AS est_over_exact
FROM occupied CROSS JOIN exact
"""

QUERIES["q_linear_counting"] = QuerySpec(
    q_linear_counting,
    Q_LC_SQL,
    "linear-counting distinct estimator (1024-bucket bitmap zeros) "
    "vs exact — one distinct-bucket count",
)

"""Round-10 surface extensions, batch AE (SURVEY §2.3 N r10): the
prep-diagnostic block — the histogram bin planner (Sturges / Scott /
Freedman-Diaconis recommendations from one moments+quantile pass)
and the log-transform diagnostic (moment skewness before vs after
log1p, with the verdict flag) — the two decisions every profiling
notebook makes before plotting anything.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal/integer moments; exact percentiles via the
F.percentile <-> quantile_cont pairing; closed-form doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# --------------------------------------- histogram bin planner
# Sturges: ceil(log2 n) + 1 bins; Scott: width 3.49 s n^(-1/3);
# Freedman-Diaconis: width 2 IQR n^(-1/3). One pass for moments +
# exact quartiles; bin counts derived from the observed range.


def q_histogram_bin_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x")
    )
    m = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("x"), 2).cast("decimal(38,2)")).alias("s"),
        F.sum(
            F.round(F.col("x"), 2).cast("decimal(19,2)")
            * F.round(F.col("x"), 2).cast("decimal(19,2)")
        )
        .cast("decimal(38,4)")
        .alias("q"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.percentile("x", 0.25).alias("q1"),
        F.percentile("x", 0.75).alias("q3"),
    )
    n = F.col("n").cast("double")
    sd = F.sqrt(
        (n * F.col("q").cast("double") - F.col("s").cast("double") ** 2)
        / (n * (F.col("n") - 1))
    )
    rng = F.col("hi") - F.col("lo")
    cbrt = F.pow(n, F.lit(1.0 / 3.0))
    scott_w = 3.49 * sd / cbrt
    fd_w = 2.0 * (F.col("q3") - F.col("q1")) / cbrt
    sturges = F.ceil(F.log2(n)) + 1
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(rng, 2).alias("value_range"),
        sturges.cast("long").alias("sturges_bins"),
        F.ceil(rng / scott_w).cast("long").alias("scott_bins"),
        F.ceil(rng / fd_w).cast("long").alias("fd_bins"),
        F.round(fd_w, 4).alias("fd_bin_width"),
    )


Q_BINPLAN_SQL = """
WITH src AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2))) AS s,
         CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(19,2))
                  * CAST(ROUND(x, 2) AS DECIMAL(19,2))) AS DECIMAL(38,4)) AS q,
         MIN(x) AS lo, MAX(x) AS hi,
         quantile_cont(x, 0.25) AS q1, quantile_cont(x, 0.75) AS q3
  FROM src),
calc AS (
  SELECT n, hi - lo AS rng, q1, q3,
         SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * (n - 1))) AS sd,
         POWER(CAST(n AS DOUBLE), 1.0/3.0) AS cbrt
  FROM m)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(rng, 2) AS value_range,
       CAST(CEIL(log2(CAST(n AS DOUBLE))) + 1 AS BIGINT) AS sturges_bins,
       CAST(CEIL(rng / (3.49 * sd / cbrt)) AS BIGINT) AS scott_bins,
       CAST(CEIL(rng / (2.0 * (q3 - q1) / cbrt)) AS BIGINT) AS fd_bins,
       ROUND(2.0 * (q3 - q1) / cbrt, 4) AS fd_bin_width
FROM calc
"""

QUERIES["q_histogram_bin_planner"] = QuerySpec(
    q_histogram_bin_planner,
    Q_BINPLAN_SQL,
    "histogram bin planner (Sturges / Scott / Freedman-Diaconis from "
    "one moments+quartile pass) — the profiling-notebook decision",
)


# --------------------------------- log-transform skew diagnostic
# Moment skewness g1 of o_totalprice before vs after log1p; the
# transform is recommended when it shrinks |skewness|. Decimal moment
# sums of rounded values; one closed-form g1 per branch.


def _skew(prefix):
    n = F.col(f"{prefix}_n").cast("double")
    s1 = F.col(f"{prefix}_s1").cast("double")
    s2 = F.col(f"{prefix}_s2").cast("double")
    s3 = F.col(f"{prefix}_s3").cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    # op order mirrors the oracle SQL token-for-token (1-ulp parity)
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    return m3 / F.pow(m2, F.lit(1.5))


def q_log_transform_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice"), 4).cast("double").alias("x"),
        F.round(F.log1p(F.col("o_totalprice")), 10).cast("double").alias("lx"),
    )
    m = orders.agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.round(F.col("x"), 4).cast("decimal(38,4)")).alias("raw_s1"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(38,6)")).alias(
            "raw_s2"
        ),
        F.sum(
            F.round(F.col("x") * F.col("x") * F.col("x"), 6).cast("decimal(38,6)")
        ).alias("raw_s3"),
        F.count(F.lit(1)).alias("log_n"),
        F.sum(F.round(F.col("lx"), 10).cast("decimal(38,10)")).alias("log_s1"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 12).cast("decimal(38,12)")).alias(
            "log_s2"
        ),
        F.sum(
            F.round(F.col("lx") * F.col("lx") * F.col("lx"), 12).cast(
                "decimal(38,12)"
            )
        ).alias("log_s3"),
    )
    raw_g1 = _skew("raw")
    log_g1 = _skew("log")
    return m.select(
        F.col("raw_n").cast("long").alias("n"),
        F.round(raw_g1, 6).alias("skew_raw"),
        F.round(log_g1, 6).alias("skew_log1p"),
        (F.abs(log_g1) < F.abs(raw_g1)).alias("log_recommended"),
    )


Q_LOGDIAG_SQL = """
WITH src AS (
  SELECT CAST(ROUND(o_totalprice, 4) AS DOUBLE) AS x,
         CAST(ROUND(LN(1 + o_totalprice), 10) AS DOUBLE) AS lx
  FROM orders),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(x, 4) AS DECIMAL(38,4))) AS r1,
         SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,6))) AS r2,
         SUM(CAST(ROUND(x * x * x, 6) AS DECIMAL(38,6))) AS r3,
         SUM(CAST(ROUND(lx, 10) AS DECIMAL(38,10))) AS l1,
         SUM(CAST(ROUND(lx * lx, 12) AS DECIMAL(38,12))) AS l2,
         SUM(CAST(ROUND(lx * lx * lx, 12) AS DECIMAL(38,12))) AS l3
  FROM src),
calc AS (
  SELECT n,
         (CAST(r3 AS DOUBLE) / n
          - 3 * (CAST(r1 AS DOUBLE) / n) * (CAST(r2 AS DOUBLE) / n)
          + 2 * (CAST(r1 AS DOUBLE) / n) * (CAST(r1 AS DOUBLE) / n)
              * (CAST(r1 AS DOUBLE) / n))
           / POWER(CAST(r2 AS DOUBLE) / n
                   - (CAST(r1 AS DOUBLE) / n) * (CAST(r1 AS DOUBLE) / n), 1.5)
           AS g_raw,
         (CAST(l3 AS DOUBLE) / n
          - 3 * (CAST(l1 AS DOUBLE) / n) * (CAST(l2 AS DOUBLE) / n)
          + 2 * (CAST(l1 AS DOUBLE) / n) * (CAST(l1 AS DOUBLE) / n)
              * (CAST(l1 AS DOUBLE) / n))
           / POWER(CAST(l2 AS DOUBLE) / n
                   - (CAST(l1 AS DOUBLE) / n) * (CAST(l1 AS DOUBLE) / n), 1.5)
           AS g_log
  FROM m)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(g_raw, 6) AS skew_raw,
       ROUND(g_log, 6) AS skew_log1p,
       ABS(g_log) < ABS(g_raw) AS log_recommended
FROM calc
"""

QUERIES["q_log_transform_diag"] = QuerySpec(
    q_log_transform_diag,
    Q_LOGDIAG_SQL,
    "log-transform diagnostic (moment skewness before vs after log1p "
    "with the verdict flag) — the prep-notebook decision",
)

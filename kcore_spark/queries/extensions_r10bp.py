"""Round-10 surface extensions, batch BP (SURVEY §2.3 N r10): the
circular-statistics block over event time-of-day angles (θ = 2π·
second_of_day/86400) — mean direction + resultant length (the
circular mean/variance pair; linear averages are WRONG for clock
data, which is the point of the family), the Rayleigh uniformity
test (z = n·R̄²; detects a daily rush hour), and the von Mises
concentration estimate (the standard piecewise A⁻¹(R̄)
approximation). Per event type, one cos/sin sum each.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: whole-second angles; cos/sin terms ROUND(·,12)-pinned
decimal sums; atan2 and the piecewise κ formula token-identical.
Scale: one grouped scan; k-row outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_TWO_PI = 6.283185307179586


def _cs_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: n, pinned Σcosθ, Σsinθ over time-of-day angles."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    sod = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.date_trunc("day", F.col("ts")))
    ).cast("double")
    theta = _TWO_PI * sod / 86400.0
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.cos(theta), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("sc"),
        F.sum(F.round(F.sin(theta), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("ss"),
    )


_CS_SQL = f"""
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(COS({_TWO_PI} * (epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                 - epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))) / 86400.0), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS sc,
         CAST(SUM(CAST(ROUND(SIN({_TWO_PI} * (epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                 - epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))) / 86400.0), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS ss
  FROM events
  GROUP BY event_type
"""


# ----------------------------------------------------- circular stats


def q_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = _cs_sums(spark, sf_dir)
    n = F.col("n").cast("double")
    rbar = F.sqrt(F.col("sc") ** 2 + F.col("ss") ** 2) / n
    mean_angle = F.atan2(F.col("ss"), F.col("sc"))
    mean_hour = (mean_angle / _TWO_PI * 24.0 + 24.0) % 24.0
    return cs.select(
        "event_type",
        "n",
        F.round(rbar, 6).alias("resultant_r"),
        F.round(1.0 - rbar, 6).alias("circular_variance"),
        F.round(mean_hour, 6).alias("mean_hour"),
    ).orderBy("event_type")


Q_CIRC_SQL = f"""
WITH cs AS ({_CS_SQL})
SELECT event_type, n,
       ROUND(SQRT(sc * sc + ss * ss) / CAST(n AS DOUBLE), 6) AS resultant_r,
       ROUND(1.0 - SQRT(sc * sc + ss * ss) / CAST(n AS DOUBLE), 6)
           AS circular_variance,
       ROUND((ATAN2(ss, sc) / {_TWO_PI} * 24.0 + 24.0) % 24.0, 6) AS mean_hour
FROM cs
ORDER BY event_type
"""

QUERIES["q_circular_stats"] = QuerySpec(
    q_circular_stats,
    Q_CIRC_SQL,
    "circular mean hour + resultant length per event type — pinned "
    "cos/sin sums, atan2 mean direction",
)


# ----------------------------------------------------- Rayleigh test
# z = n·R̄²; the small-sample-corrected p ≈ exp(−z)·(1 + (2z − z²)/
# (4n)) (Zar's approximation, pinned).


def q_rayleigh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = _cs_sums(spark, sf_dir)
    n = F.col("n").cast("double")
    r2 = (F.col("sc") ** 2 + F.col("ss") ** 2) / (n * n)
    z = n * r2
    p = F.exp(-z) * (1.0 + (2.0 * z - z * z) / (4.0 * n))
    return cs.select(
        "event_type",
        "n",
        F.round(z, 6).alias("rayleigh_z"),
        F.round(F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0)), 6).alias(
            "p_approx"
        ),
    ).orderBy("event_type")


Q_RAYLEIGH_SQL = f"""
WITH cs AS ({_CS_SQL})
SELECT event_type, n,
       ROUND(CAST(n AS DOUBLE) * (sc * sc + ss * ss)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS rayleigh_z,
       ROUND(LEAST(GREATEST(
         EXP(-(CAST(n AS DOUBLE) * (sc * sc + ss * ss)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         * (1.0 + (2.0 * (CAST(n AS DOUBLE) * (sc * sc + ss * ss)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   - (CAST(n AS DOUBLE) * (sc * sc + ss * ss)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     * (CAST(n AS DOUBLE) * (sc * sc + ss * ss)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                  / (4.0 * CAST(n AS DOUBLE))), 0.0), 1.0), 6) AS p_approx
FROM cs
ORDER BY event_type
"""

QUERIES["q_rayleigh_test"] = QuerySpec(
    q_rayleigh_test,
    Q_RAYLEIGH_SQL,
    "Rayleigh uniformity test on time-of-day angles — z = nR², "
    "Zar-approximation p, pinned",
)


# ------------------------------------------- von Mises concentration
# Best-practice piecewise approximation of κ = A⁻¹(R̄):
#   R < 0.53:  κ = 2R + R³ + 5R⁵/6
#   R < 0.85:  κ = −0.4 + 1.39R + 0.43/(1−R)
#   else:      κ = 1/(R³ − 4R² + 3R)


def q_von_mises_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = _cs_sums(spark, sf_dir)
    n = F.col("n").cast("double")
    r = F.sqrt(F.col("sc") ** 2 + F.col("ss") ** 2) / n
    kappa = (
        F.when(r < 0.53, 2.0 * r + r * r * r + 5.0 * F.pow(r, F.lit(5.0)) / 6.0)
        .when(r < 0.85, -0.4 + 1.39 * r + 0.43 / (1.0 - r))
        .otherwise(1.0 / (r * r * r - 4.0 * r * r + 3.0 * r))
    )
    return cs.select(
        "event_type",
        "n",
        F.round(r, 6).alias("resultant_r"),
        F.round(kappa, 6).alias("vm_kappa"),
    ).orderBy("event_type")


Q_VM_SQL = f"""
WITH cs AS ({_CS_SQL}),
rbar AS (
  SELECT event_type, n,
         SQRT(sc * sc + ss * ss) / CAST(n AS DOUBLE) AS r
  FROM cs)
SELECT event_type, n,
       ROUND(r, 6) AS resultant_r,
       ROUND(CASE WHEN r < 0.53 THEN 2.0 * r + r * r * r + 5.0 * POWER(r, 5.0) / 6.0
                  WHEN r < 0.85 THEN -0.4 + 1.39 * r + 0.43 / (1.0 - r)
                  ELSE 1.0 / (r * r * r - 4.0 * r * r + 3.0 * r) END, 6) AS vm_kappa
FROM rbar
ORDER BY event_type
"""

QUERIES["q_von_mises_kappa"] = QuerySpec(
    q_von_mises_kappa,
    Q_VM_SQL,
    "von Mises concentration via the piecewise A-inverse "
    "approximation — one cos/sin rollup",
)

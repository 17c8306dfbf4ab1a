"""Round-10 surface extensions, batch X (SURVEY §2.3 N r10): the
modern two-sample-test block — exact 1-D Wasserstein-1 distance
(optimal transport as the area between ECDFs over the distinct-value
tie table — the q_ks_test machinery upgraded from sup to integral),
energy distance, and RBF-kernel maximum mean discrepancy (both over
pinned md5 samples: their pairwise kernels are sample-bounded, never
corpus-quadratic). The three distances that replaced KS in modern
drift detection.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: W1 is integer-count x decimal-gap arithmetic on the tie
table; energy/MMD pair terms are rounded then decimal-summed over
md5-pinned samples (64 per arm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ---------------- exact Wasserstein-1 between click and purchase values
# W1 = integral over v of |F_a(v) - F_b(v)| — computed exactly on the
# union distinct-value table: each gap between consecutive values
# contributes |cdf_a - cdf_b| * gap. Integer cumulative counts, one
# decimal gap product per tie row (value-cardinality-bounded — the
# q_ks_test adjudication).


def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "event_type", F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v")
    )
    vals = ev.groupBy("v").agg(
        F.sum((F.col("event_type") == "click").cast("int")).alias("ca"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = vals.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    steps = (
        vals.withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .withColumn("nxt", F.lead("v").over(Window.orderBy("v")))
        .where(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(tot))
    )
    contrib = F.round(
        F.abs(
            F.col("cuma").cast("double") / F.col("na")
            - F.col("cumb").cast("double") / F.col("nb")
        )
        * (F.col("nxt") - F.col("v")).cast("double"),
        12,
    ).cast("decimal(28,12)")
    return steps.agg(
        F.max("na").cast("long").alias("n_click"),
        F.max("nb").cast("long").alias("n_purchase"),
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.round(F.sum(contrib).cast("double"), 6).alias("wasserstein_1"),
    )


Q_W1_SQL = """
WITH src AS (
  SELECT event_type, CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v
  FROM events WHERE event_type IN ('click', 'purchase')),
vals AS (
  SELECT v,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
  FROM src GROUP BY v),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM vals),
steps AS (
  SELECT v, LEAD(v) OVER (ORDER BY v) AS nxt,
         SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cumb
  FROM vals),
contrib AS (
  SELECT s.*, t.na, t.nb,
         CAST(ROUND(ABS(CAST(cuma AS DOUBLE) / t.na
                        - CAST(cumb AS DOUBLE) / t.nb)
                    * CAST(nxt - v AS DOUBLE), 12) AS DECIMAL(28,12)) AS a
  FROM steps s, tot t WHERE s.nxt IS NOT NULL)
SELECT CAST(MAX(na) AS BIGINT) AS n_click,
       CAST(MAX(nb) AS BIGINT) AS n_purchase,
       CAST(COUNT(*) AS BIGINT) AS n_steps,
       ROUND(CAST(SUM(a) AS DOUBLE), 6) AS wasserstein_1
FROM contrib
"""

QUERIES["q_wasserstein_1d"] = QuerySpec(
    q_wasserstein_1d,
    Q_W1_SQL,
    "exact 1-D Wasserstein-1 between click and purchase values (area "
    "between ECDFs over the tie table) — optimal-transport drift",
)


# ---------------------------------------- sampled two-sample kernels
# A pinned md5 sample of 64 values per arm; energy distance and
# RBF-MMD from the three pairwise blocks (aa, bb, ab) — 64^2 terms
# per block regardless of corpus size.

_SAMPLE_MOD = 97  # ~1/97 of rows, capped below


def _samples(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "event_type",
        "event_id",
        F.round(F.col("value"), 6).cast("double").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return ev.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 64)


_SAMPLE_SQL = """
src AS (
  SELECT event_type, event_id, CAST(ROUND(value, 6) AS DOUBLE) AS v
  FROM events WHERE event_type IN ('click', 'purchase')),
samp AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
    FROM src)
  WHERE rk <= 64)
"""


def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    samp = _samples(spark, sf_dir)
    a = samp.where(F.col("event_type") == "click").select(F.col("v").alias("x"))
    b = samp.where(F.col("event_type") == "purchase").select(F.col("v").alias("y"))

    def mean_abs(d1, c1, d2, c2):
        j = d1.crossJoin(d2)
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.abs(F.col(c1) - F.col(c2)), 10).cast("decimal(28,10)")
            ).alias("s"),
        ).select((F.col("s").cast("double") / F.col("n")).alias("m"))

    ab = mean_abs(a, "x", b.withColumnRenamed("y", "y2"), "y2")
    aa = mean_abs(a, "x", a.withColumnRenamed("x", "x2"), "x2")
    bb = mean_abs(b, "y", b.withColumnRenamed("y", "y2"), "y2")
    return (
        ab.select(F.col("m").alias("m_ab"))
        .crossJoin(F.broadcast(aa.select(F.col("m").alias("m_aa"))))
        .crossJoin(F.broadcast(bb.select(F.col("m").alias("m_bb"))))
        .select(
            F.round(F.col("m_ab"), 6).alias("mean_cross_dist"),
            F.round(
                2 * F.col("m_ab") - F.col("m_aa") - F.col("m_bb"), 6
            ).alias("energy_distance"),
        )
    )


Q_ENERGY_SQL = f"""
WITH {_SAMPLE_SQL},
a AS (SELECT v AS x FROM samp WHERE event_type = 'click'),
b AS (SELECT v AS y FROM samp WHERE event_type = 'purchase'),
ab AS (SELECT CAST(SUM(CAST(ROUND(ABS(x - y), 10) AS DECIMAL(28,10)))
              AS DOUBLE) / COUNT(*) AS m FROM a, b),
aa AS (SELECT CAST(SUM(CAST(ROUND(ABS(a1.x - a2.x), 10) AS DECIMAL(28,10)))
              AS DOUBLE) / COUNT(*) AS m FROM a a1, a a2),
bb AS (SELECT CAST(SUM(CAST(ROUND(ABS(b1.y - b2.y), 10) AS DECIMAL(28,10)))
              AS DOUBLE) / COUNT(*) AS m FROM b b1, b b2)
SELECT ROUND(ab.m, 6) AS mean_cross_dist,
       ROUND(2 * ab.m - aa.m - bb.m, 6) AS energy_distance
FROM ab, aa, bb
"""

QUERIES["q_energy_distance"] = QuerySpec(
    q_energy_distance,
    Q_ENERGY_SQL,
    "energy distance between click/purchase values over pinned "
    "64-per-arm md5 samples (sample-bounded pair blocks)",
)


_GAMMA = 0.5  # RBF bandwidth 1/(2*sigma^2) with sigma = 1


def q_mmd_rbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    samp = _samples(spark, sf_dir)
    a = samp.where(F.col("event_type") == "click").select(F.col("v").alias("x"))
    b = samp.where(F.col("event_type") == "purchase").select(F.col("v").alias("y"))

    def mean_k(d1, c1, d2, c2):
        j = d1.crossJoin(d2)
        k = F.exp(-F.lit(_GAMMA) * (F.col(c1) - F.col(c2)) * (F.col(c1) - F.col(c2)))
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(k, 12).cast("decimal(28,12)")).alias("s"),
        ).select((F.col("s").cast("double") / F.col("n")).alias("m"))

    ab = mean_k(a, "x", b.withColumnRenamed("y", "y2"), "y2")
    aa = mean_k(a, "x", a.withColumnRenamed("x", "x2"), "x2")
    bb = mean_k(b, "y", b.withColumnRenamed("y", "y2"), "y2")
    return (
        ab.select(F.col("m").alias("k_ab"))
        .crossJoin(F.broadcast(aa.select(F.col("m").alias("k_aa"))))
        .crossJoin(F.broadcast(bb.select(F.col("m").alias("k_bb"))))
        .select(
            F.round(F.col("k_ab"), 6).alias("mean_cross_kernel"),
            F.round(
                F.col("k_aa") + F.col("k_bb") - 2 * F.col("k_ab"), 6
            ).alias("mmd2_rbf"),
        )
    )


Q_MMD_SQL = f"""
WITH {_SAMPLE_SQL},
a AS (SELECT v AS x FROM samp WHERE event_type = 'click'),
b AS (SELECT v AS y FROM samp WHERE event_type = 'purchase'),
ab AS (SELECT CAST(SUM(CAST(ROUND(EXP(-{_GAMMA} * (x - y) * (x - y)), 12)
              AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m FROM a, b),
aa AS (SELECT CAST(SUM(CAST(ROUND(EXP(-{_GAMMA} * (a1.x - a2.x) * (a1.x - a2.x)), 12)
              AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m FROM a a1, a a2),
bb AS (SELECT CAST(SUM(CAST(ROUND(EXP(-{_GAMMA} * (b1.y - b2.y) * (b1.y - b2.y)), 12)
              AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m FROM b b1, b b2)
SELECT ROUND(ab.m, 6) AS mean_cross_kernel,
       ROUND(aa.m + bb.m - 2 * ab.m, 6) AS mmd2_rbf
FROM ab, aa, bb
"""

QUERIES["q_mmd_rbf"] = QuerySpec(
    q_mmd_rbf,
    Q_MMD_SQL,
    "RBF-kernel MMD^2 between click/purchase values over pinned "
    "64-per-arm md5 samples — the kernel two-sample test",
)

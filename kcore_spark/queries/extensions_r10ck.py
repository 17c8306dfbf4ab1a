"""Round-10 surface extensions, batch CK (SURVEY §2.3 N r10): the
calibration block, second wave, over the SAME pinned sigmoid scorer as
q_brier_calibration / q_ece (shared _CAL_W weights, pos = label >= 5,
so the whole family describes one model) — the Hosmer-Lemeshow C
statistic (decile-of-risk chi-square: THE regression-calibration
gate), Spiegelhalter's z (the exactly-normal calibration test that
needs no binning at all), and the Brier skill score against the
climatology baseline (is the model better than always predicting the
base rate?).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: risk deciles use the exact-NTILE fill arithmetic over
_dist_rank (the q_perplexity_buckets convention — no global window);
per-row fractional terms are rounded and decimal-summed; the pinned
A&S Phi gives the Spiegelhalter p.
Scale: one embeddings scan per query; the decile assignment is
range-repartitioned rank, everything else is group-by folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import as_double
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _CAL_W, _dist_rank
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}

_G = 10  # Hosmer-Lemeshow groups


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(c) for c in _CAL_W])
    x = as_double(F.col("embedding"))
    logit = F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    p = 1.0 / (1.0 + F.exp(-logit))
    return emb.select(
        "vec_id",
        F.round(p, 10).alias("p"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )


_CAL_W_SQL = ", ".join(str(c) for c in _CAL_W)
_SCORED_SQL = f"""
  scored AS (
    SELECT vec_id,
           ROUND(1.0 / (1.0 + EXP(-list_reduce(list_prepend(0.0,
             list_transform(list_zip(embedding::DOUBLE[], [{_CAL_W_SQL}]),
                            p -> p[1] * p[2])), (a, b) -> a + b))), 10) AS p,
           CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
    FROM embeddings)
"""


def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    n = sc.count()
    q, r = divmod(n, _G)
    ranked = _dist_rank(sc, [F.col("p"), F.col("vec_id")])
    binned = ranked.withColumn(
        "g",
        (
            F.when(F.col("rk") <= r * (q + 1), (F.col("rk") - 1) / (q + 1))
            .otherwise(r + (F.col("rk") - r * (q + 1) - 1) / q)
            .cast("long")
            + 1
        ).cast("int"),
    )
    per_g = binned.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("o1"),
        F.sum(F.round("p", 10).cast("decimal(28,10)")).cast("double").alias("e1"),
    )
    terms = per_g.select(
        F.round(
            (F.col("o1") - F.col("e1")) ** 2 / F.col("e1")
            + ((F.col("n_g") - F.col("o1")) - (F.col("n_g") - F.col("e1"))) ** 2
            / (F.col("n_g") - F.col("e1")),
            10,
        )
        .cast("decimal(38,10)")
        .alias("t"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        (F.count(F.lit(1)) - 2).cast("long").alias("df"),
        F.round(F.sum("t").cast("double"), 6).alias("hl_chi2"),
    )


Q_HL_SQL = f"""
WITH {_SCORED_SQL},
binned AS (
  SELECT y, p, CAST(NTILE({_G}) OVER (ORDER BY p, vec_id) AS INT) AS g
  FROM scored),
per_g AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(y) AS BIGINT) AS o1,
         CAST(SUM(CAST(ROUND(p, 10) AS DECIMAL(28,10))) AS DOUBLE) AS e1
  FROM binned GROUP BY g),
terms AS (
  SELECT CAST(ROUND(POWER(o1 - e1, 2) / e1
                    + POWER((n_g - o1) - (n_g - e1), 2) / (n_g - e1), 10)
              AS DECIMAL(38,10)) AS t
  FROM per_g)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) - 2 AS BIGINT) AS df,
       ROUND(CAST(SUM(t) AS DOUBLE), 6) AS hl_chi2
FROM terms
"""

QUERIES["q_hosmer_lemeshow"] = QuerySpec(
    q_hosmer_lemeshow,
    Q_HL_SQL,
    "Hosmer-Lemeshow decile-of-risk chi-square for the pinned sigmoid "
    "scorer — exact NTILE via _dist_rank, decimal expected sums",
)


def q_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    agg = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.round((F.col("y") - F.col("p")) * (1.0 - 2.0 * F.col("p")), 10)
            .cast("decimal(38,10)")
        )
        .cast("double")
        .alias("num"),
        F.sum(
            F.round(
                (1.0 - 2.0 * F.col("p")) ** 2 * F.col("p") * (1.0 - F.col("p")),
                10,
            ).cast("decimal(38,10)")
        )
        .cast("double")
        .alias("den"),
    )
    z = F.col("num") / F.sqrt(F.col("den"))
    return agg.select(
        "n",
        F.round(z, 6).alias("z_spiegelhalter"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_two_sided"),
    )


_ZSP = "(num / SQRT(den))"
Q_SPIEG_SQL = f"""
WITH {_SCORED_SQL},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND((y - p) * (1.0 - 2.0 * p), 10)
                       AS DECIMAL(38,10))) AS DOUBLE) AS num,
         CAST(SUM(CAST(ROUND(POWER(1.0 - 2.0 * p, 2) * p * (1.0 - p), 10)
                       AS DECIMAL(38,10))) AS DOUBLE) AS den
  FROM scored)
SELECT n,
       ROUND({_ZSP}, 6) AS z_spiegelhalter,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_ZSP})")}), 6)
           AS p_two_sided
FROM agg
"""

QUERIES["q_spiegelhalter_z"] = QuerySpec(
    q_spiegelhalter_z,
    Q_SPIEG_SQL,
    "Spiegelhalter's binning-free calibration z for the pinned scorer — "
    "decimal moment sums, pinned Phi",
)


def q_brier_skill_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    agg = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(
            F.round((F.col("y") - F.col("p")) ** 2, 10).cast("decimal(38,10)")
        )
        .cast("double")
        .alias("s_bs"),
    )
    nd = F.col("n").cast("double")
    base = F.col("n_pos").cast("double") / nd
    bs = F.col("s_bs") / nd
    bs_ref = base * (1.0 - base)
    return agg.select(
        "n",
        F.round(base, 6).alias("base_rate"),
        F.round(bs, 6).alias("brier"),
        F.round(bs_ref, 6).alias("brier_climatology"),
        F.round(1.0 - bs / bs_ref, 6).alias("bss"),
    )


Q_BSS_SQL = f"""
WITH {_SCORED_SQL},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(CAST(ROUND(POWER(y - p, 2), 10) AS DECIMAL(38,10)))
              AS DOUBLE) AS s_bs
  FROM scored)
SELECT n,
       ROUND(n_pos / CAST(n AS DOUBLE), 6) AS base_rate,
       ROUND(s_bs / n, 6) AS brier,
       ROUND((n_pos / CAST(n AS DOUBLE)) * (1.0 - n_pos / CAST(n AS DOUBLE)), 6)
           AS brier_climatology,
       ROUND(1.0 - (s_bs / n)
             / ((n_pos / CAST(n AS DOUBLE))
                * (1.0 - n_pos / CAST(n AS DOUBLE))), 6) AS bss
FROM agg
"""

QUERIES["q_brier_skill_score"] = QuerySpec(
    q_brier_skill_score,
    Q_BSS_SQL,
    "Brier skill score vs climatology for the pinned scorer — one "
    "scan, decimal loss sums",
)

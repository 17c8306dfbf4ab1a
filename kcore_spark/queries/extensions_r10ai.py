"""Round-10 surface extensions, batch AI (SURVEY §2.3 N r10): the
EDF goodness-of-fit block — Anderson-Darling and Cramér-von Mises
one-sample normality statistics (the heavier-tailed complements to
q_ks_test / q_jarque_bera), plus a normal Q-Q vigintile table (the
probability-plot diagnostic). The normal CDF is the Abramowitz &
Stegun 26.2.17 polynomial, written token-identically in both engines
so the statistic is PINNED (approximation error is shared, not
compared); the Q-Q theoretical quantiles are hard literal z-values,
needing no inverse CDF at all.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal-exact moments; ROUND(·,9)-pinned per-row terms
summed as exact decimals; the rank is tie-invariant (tied x share F,
and the tie block's coefficient sum is order-free).
Scale: the global sort rank uses the repo's distributed exact-rank
pattern (_dist_rank, extensions_r8.py — range repartition +
per-partition offsets), NOT a single-task window; everything else is
one scan + 1-row broadcast crosses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_rank

QUERIES: dict[str, QuerySpec] = {}

_INV_SQRT_2PI = 0.3989422804014327


def _phi(z):
    """A&S 26.2.17 normal CDF — same literals and op order as the SQL."""
    az = F.abs(z)
    k = 1.0 / (1.0 + 0.2316419 * az)
    poly = k * (
        0.319381530
        + k * (-0.356563782 + k * (1.781477937 + k * (-1.821255978 + k * 1.330274429)))
    )
    upper = F.exp(-az * az / 2.0) * _INV_SQRT_2PI * poly
    return F.when(z >= 0, 1.0 - upper).otherwise(upper)


_PHI_SQL = (
    "CASE WHEN {z} >= 0 THEN 1.0 - EXP(-ABS({z}) * ABS({z}) / 2.0) * 0.3989422804014327"
    " * ((1.0 / (1.0 + 0.2316419 * ABS({z}))) * (0.319381530 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * ABS({z}))) * (1.781477937 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * ABS({z}))) * 1.330274429)))))"
    " ELSE EXP(-ABS({z}) * ABS({z}) / 2.0) * 0.3989422804014327"
    " * ((1.0 / (1.0 + 0.2316419 * ABS({z}))) * (0.319381530 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * ABS({z}))) * (1.781477937 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * ABS({z}))) * 1.330274429))))) END"
)


def _ranked_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders' totalprice with global rank rk, n, and pinned Φ(z)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(15,2)").alias("p")
    )
    m = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").alias("s1"),
        F.sum(F.col("p") * F.col("p")).alias("s2"),
    )
    ranked = _dist_rank(orders, [F.col("p"), F.col("o_orderkey")])
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    sd = F.sqrt(
        (nd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (nd * (nd - 1))
    )
    z = (F.col("p").cast("double") - mean) / sd
    f = _phi(z)
    f = F.least(F.greatest(f, F.lit(1e-15)), F.lit(1.0 - 1e-15))
    return ranked.crossJoin(F.broadcast(m)).select(
        "rk", F.col("n"), f.alias("f")
    )


_RANKED_SQL = f"""
  SELECT ROW_NUMBER() OVER (ORDER BY p, o_orderkey) AS rk, n,
         LEAST(GREATEST({_PHI_SQL.format(z='((CAST(p AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))))')}, 1e-15), 1.0 - 1e-15) AS f
  FROM (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(15,2)) AS p FROM orders)
  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS s1,
                     SUM(CAST(o_totalprice AS DECIMAL(15,2))
                         * CAST(o_totalprice AS DECIMAL(15,2))) AS s2
              FROM orders)
"""


# ---------------------------------------------- Anderson-Darling A²
# A² = −n − (1/n) Σ_i [(2i−1)·lnF_i + (2n−2i+1)·ln(1−F_i)] — the
# per-row form that needs only the row's OWN rank, so the reversed
# pairing never materializes.


def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    rf = _ranked_f(spark, sf_dir)
    term = (2 * F.col("rk") - 1).cast("double") * F.log("f") + (
        2 * F.col("n") - 2 * F.col("rk") + 1
    ).cast("double") * F.log(1.0 - F.col("f"))
    s = rf.agg(
        F.first("n").alias("n"),
        F.sum(F.round(term, 9).cast("decimal(28,9)")).alias("s"),
    )
    return s.select(
        "n",
        F.round(
            -F.col("n").cast("double")
            - F.col("s").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("ad_stat"),
    )


Q_AD_SQL = f"""
WITH rf AS ({_RANKED_SQL}),
s AS (
  SELECT ANY_VALUE(n) AS n,
         SUM(CAST(ROUND(CAST(2 * rk - 1 AS DOUBLE) * LN(f)
                        + CAST(2 * n - 2 * rk + 1 AS DOUBLE) * LN(1.0 - f), 9)
                  AS DECIMAL(28,9))) AS s
  FROM rf)
SELECT n, ROUND(-CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ad_stat
FROM s
"""

QUERIES["q_anderson_darling"] = QuerySpec(
    q_anderson_darling,
    Q_AD_SQL,
    "Anderson-Darling one-sample normality statistic — pinned A&S "
    "normal CDF, distributed exact rank, decimal-exact term sum",
)


# --------------------------------------------- Cramér-von Mises W²
# W² = 1/(12n) + Σ_i (F_i − (2i−1)/(2n))².


def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    rf = _ranked_f(spark, sf_dir)
    gap = F.col("f") - (2 * F.col("rk") - 1).cast("double") / (
        2 * F.col("n")
    ).cast("double")
    s = rf.agg(
        F.first("n").alias("n"),
        F.sum(F.round(gap * gap, 12).cast("decimal(28,12)")).alias("s"),
    )
    return s.select(
        "n",
        F.round(
            1.0 / (12.0 * F.col("n").cast("double")) + F.col("s").cast("double"), 6
        ).alias("cvm_stat"),
    )


Q_CVM_SQL = f"""
WITH rf AS ({_RANKED_SQL}),
s AS (
  SELECT ANY_VALUE(n) AS n,
         SUM(CAST(ROUND((f - CAST(2 * rk - 1 AS DOUBLE) / CAST(2 * n AS DOUBLE))
                        * (f - CAST(2 * rk - 1 AS DOUBLE) / CAST(2 * n AS DOUBLE)), 12)
                  AS DECIMAL(28,12))) AS s
  FROM rf)
SELECT n, ROUND(1.0 / (12.0 * CAST(n AS DOUBLE)) + CAST(s AS DOUBLE), 6) AS cvm_stat
FROM s
"""

QUERIES["q_cramer_von_mises"] = QuerySpec(
    q_cramer_von_mises,
    Q_CVM_SQL,
    "Cramér-von Mises one-sample normality statistic — pinned A&S "
    "normal CDF, distributed exact rank",
)


# ------------------------------------------------- normal Q-Q table
# Sample vigintiles (exact interpolated percentiles) against HARD
# LITERAL standard-normal quantiles — the probability-plot diagnostic
# with zero inverse-CDF code. The 19 z literals are Φ⁻¹(i/20),
# i = 1..19, pinned to 6 decimals in both engines.

_QQ_Z = [
    (0.05, -1.644854), (0.10, -1.281552), (0.15, -1.036433),
    (0.20, -0.841621), (0.25, -0.674490), (0.30, -0.524401),
    (0.35, -0.385320), (0.40, -0.253347), (0.45, -0.125661),
    (0.50, 0.0), (0.55, 0.125661), (0.60, 0.253347),
    (0.65, 0.385320), (0.70, 0.524401), (0.75, 0.674490),
    (0.80, 0.841621), (0.85, 1.036433), (0.90, 1.281552),
    (0.95, 1.644854),
]


def q_qq_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(15,2)").alias("p")
    )
    m = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").alias("s1"),
        F.sum(F.col("p") * F.col("p")).alias("s2"),
        *[
            F.percentile(F.col("p").cast("double"), q).alias(f"q{int(q*100)}")
            for q, _ in _QQ_Z
        ],
    )
    grid = F.array(
        *[F.struct(F.lit(q).alias("q"), F.lit(z).alias("z")) for q, z in _QQ_Z]
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    sd = F.sqrt(
        (nd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (nd * (nd - 1))
    )
    rows = m.select(
        mean.alias("mean"), sd.alias("sd"), F.explode(grid).alias("g"),
        *[F.col(f"q{int(q*100)}") for q, _ in _QQ_Z],
    )
    sample_q = None
    for q, _ in _QQ_Z:
        sample_q = (
            F.when(F.col("g.q") == q, F.col(f"q{int(q*100)}"))
            if sample_q is None
            else sample_q.when(F.col("g.q") == q, F.col(f"q{int(q*100)}"))
        )
    return rows.select(
        F.col("g.q").alias("p"),
        F.col("g.z").alias("theoretical_z"),
        F.round(sample_q, 4).alias("sample_q"),
        F.round((sample_q - F.col("mean")) / F.col("sd"), 6).alias("sample_z"),
    ).orderBy("p")


_QQ_VALUES = ", ".join(f"({q}, {z})" for q, z in _QQ_Z)
_QQ_PCTS = ", ".join(
    f"quantile_cont(CAST(p AS DOUBLE), {q}) AS q{int(q*100)}" for q, _ in _QQ_Z
)
_QQ_CASE = " ".join(
    f"WHEN g.p = {q} THEN m.q{int(q*100)}" for q, _ in _QQ_Z
)

Q_QQ_SQL = f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(p) AS s1, SUM(p * p) AS s2, {_QQ_PCTS}
  FROM (SELECT CAST(o_totalprice AS DECIMAL(15,2)) AS p FROM orders)),
grid(p, z) AS (VALUES {_QQ_VALUES})
SELECT g.p, g.z AS theoretical_z,
       ROUND(CASE {_QQ_CASE} END, 4) AS sample_q,
       ROUND((CASE {_QQ_CASE} END
              - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS sample_z
FROM grid g CROSS JOIN m
ORDER BY g.p
"""

QUERIES["q_qq_normal"] = QuerySpec(
    q_qq_normal,
    Q_QQ_SQL,
    "normal Q-Q vigintile table — exact sample percentiles vs literal "
    "Φ⁻¹ grid, one moments+quantiles pass",
)

"""Round-9 surface extensions, batch V (SURVEY §2.3 N r9): the
hashing trick (feature hashing of bag-of-words into a fixed 64-dim
signed space — the memory-bounded featurizer), Neyman allocation
(variance-optimal stratified sample sizing — the survey-design
complement to q_raking_ipf), and two-component Gaussian-mixture EM
run ENTIRELY in-engine (four unrolled E/M rounds; parameters are
rounded to 9 decimals between rounds so both engines walk the same
trajectory — the q_bigram_lm_score float discipline applied to an
iterative estimator).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------ feature hashing (the hashing trick)
# Bag-of-words → fixed 64-dim signed space: dim = md5(word) % 64,
# sign = parity of another md5 nibble (the signed variant that keeps
# collisions unbiased). Output: per-source centroid ENERGY per
# bucket-octant — an 8-row-per-source summary that pins the whole
# hashed representation while staying curve-sized. Integer counts
# until the final normalization.

_FH_DIMS = 64


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    dim = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long") % _FH_DIMS
    )
    sign = F.when(
        F.conv(F.substring(F.md5(F.col("w")), 9, 2), 16, 10).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    hashed = toks.select("source", dim.alias("dim"), sign.alias("s"))
    per_dim = hashed.groupBy("source", "dim").agg(F.sum("s").alias("v"))
    octant = per_dim.groupBy("source", (F.col("dim") / 8).cast("long").alias("octant")).agg(
        F.sum(F.col("v") * F.col("v")).alias("energy"),
        F.sum(F.abs(F.col("v"))).alias("l1"),
    )
    tot = octant.groupBy("source").agg(F.sum("energy").alias("te"))
    return (
        octant.join(tot, "source")
        .select(
            "source",
            "octant",
            F.col("l1").cast("long").alias("l1"),
            F.round(F.col("energy") / F.col("te"), 6).alias("energy_share"),
        )
        .orderBy("source", "octant")
    )


Q_FEATURE_HASH_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
hashed AS (
  SELECT source,
         ('0x' || substring(md5(w), 1, 8))::BIGINT % {_FH_DIMS} AS dim,
         CASE WHEN ('0x' || substring(md5(w), 9, 2))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM toks),
per_dim AS (SELECT source, dim, SUM(s) AS v FROM hashed GROUP BY source, dim),
octant AS (
  SELECT source, dim // 8 AS octant,
         SUM(v * v) AS energy, SUM(ABS(v)) AS l1
  FROM per_dim GROUP BY 1, 2),
tot AS (SELECT source, SUM(energy) AS te FROM octant GROUP BY source)
SELECT octant.source, octant.octant, CAST(l1 AS BIGINT) AS l1,
       ROUND(energy * 1.0 / te, 6) AS energy_share
FROM octant JOIN tot ON octant.source = tot.source
ORDER BY octant.source, octant.octant
"""

QUERIES["q_feature_hashing"] = QuerySpec(
    q_feature_hashing,
    Q_FEATURE_HASH_SQL,
    "feature hashing: signed md5 hashing trick into 64 dims, "
    "per-source octant energy summary — integer until normalization",
)


# -------------------------- Neyman allocation (survey design)
# n_h ∝ N_h·σ_h: allocate a fixed total sample across strata
# (priorities) proportionally to stratum size × stratum std — the
# variance-optimal design. One moments pass, k-row finishing math;
# integer-rounded allocations plus the largest-remainder correction
# so they sum EXACTLY to the budget (the q_corpus_mixture idiom).

_NEYMAN_BUDGET = 1000


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("stratum"), F.col("o_totalprice").alias("x")
    )
    m = orders.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_h"), F.round(F.stddev_samp("x"), 6).alias("sd_h")
    )
    tot = m.agg(F.sum(F.col("n_h") * F.col("sd_h")).alias("z"))
    raw = m.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        "sd_h",
        (F.col("n_h") * F.col("sd_h") / F.col("z") * _NEYMAN_BUDGET).alias("raw"),
    )
    flo = raw.select(
        "stratum", "n_h", "sd_h", "raw", F.floor("raw").cast("long").alias("base"),
        (F.col("raw") - F.floor("raw")).alias("frac"),
    )
    short = flo.agg((F.lit(_NEYMAN_BUDGET) - F.sum("base")).alias("k"))
    from pyspark.sql import Window

    wr = Window.orderBy(F.col("frac").desc(), F.col("stratum"))
    return (
        flo.crossJoin(F.broadcast(short))
        .withColumn("rk", F.row_number().over(wr))
        .select(
            "stratum",
            F.col("n_h").cast("long").alias("stratum_size"),
            "sd_h",
            (F.col("base") + (F.col("rk") <= F.col("k")).cast("long")).alias(
                "allocated"
            ),
        )
        .orderBy("stratum")
    )


Q_NEYMAN_SQL = f"""
WITH m AS (
  SELECT o_orderpriority AS stratum, COUNT(*) AS n_h,
         ROUND(STDDEV_SAMP(o_totalprice), 6) AS sd_h
  FROM orders GROUP BY 1),
tot AS (SELECT SUM(n_h * sd_h) AS z FROM m),
raw AS (
  SELECT stratum, n_h, sd_h, n_h * sd_h / z * {_NEYMAN_BUDGET} AS raw
  FROM m CROSS JOIN tot),
flo AS (
  SELECT stratum, n_h, sd_h, raw, CAST(FLOOR(raw) AS BIGINT) AS base,
         raw - FLOOR(raw) AS frac
  FROM raw),
short AS (SELECT {_NEYMAN_BUDGET} - SUM(base) AS k FROM flo)
SELECT stratum, CAST(n_h AS BIGINT) AS stratum_size, sd_h,
       base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, stratum)
                        <= (SELECT k FROM short) THEN 1 ELSE 0 END AS allocated
FROM flo
ORDER BY stratum
"""

QUERIES["q_neyman_allocation"] = QuerySpec(
    q_neyman_allocation,
    Q_NEYMAN_SQL,
    "Neyman allocation: variance-optimal stratified sample sizing "
    "with largest-remainder integer correction (sums to the budget)",
)


# -------------------- two-component Gaussian mixture EM (in-engine)
# Four unrolled E/M rounds on x = ln(price): responsibilities are
# row-level exp/sqrt of BROADCAST parameters; the M-step is one
# moments aggregate. Parameters are ROUND(·, 9) between rounds so
# both engines walk the same trajectory (libm ulp differences cannot
# accumulate across iterations — the q_bigram_lm_score discipline).
# No driver numerics: the iterate stays a 1-row DataFrame.

_EM_ROUNDS = 4


def _em_estep_mstep(src: DataFrame, params: DataFrame) -> DataFrame:
    """One EM round: src(x) × params(pi2, mu1, s1, mu2, s2) → new
    params (all ROUND 9)."""
    c = src.crossJoin(F.broadcast(params))
    n1 = F.exp(
        -(F.col("x") - F.col("mu1")) * (F.col("x") - F.col("mu1"))
        / (2.0 * F.col("s1") * F.col("s1"))
    ) / F.col("s1")
    n2 = F.exp(
        -(F.col("x") - F.col("mu2")) * (F.col("x") - F.col("mu2"))
        / (2.0 * F.col("s2") * F.col("s2"))
    ) / F.col("s2")
    r2 = (F.col("pi2") * n2) / ((1.0 - F.col("pi2")) * n1 + F.col("pi2") * n2)
    e = c.select("x", r2.alias("r2"))
    m = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2").alias("sr"),
        F.sum(F.col("r2") * F.col("x")).alias("srx"),
        F.sum(F.col("r2") * F.col("x") * F.col("x")).alias("srxx"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    mu2 = F.col("srx") / F.col("sr")
    mu1 = (F.col("sx") - F.col("srx")) / (F.col("n") - F.col("sr"))
    v2 = F.col("srxx") / F.col("sr") - mu2 * mu2
    v1 = (F.col("sxx") - F.col("srxx")) / (F.col("n") - F.col("sr")) - mu1 * mu1
    return m.select(
        F.round(F.col("sr") / F.col("n"), 9).alias("pi2"),
        F.round(mu1, 9).alias("mu1"),
        F.round(F.sqrt(F.greatest(v1, F.lit(1e-12))), 9).alias("s1"),
        F.round(mu2, 9).alias("mu2"),
        F.round(F.sqrt(F.greatest(v2, F.lit(1e-12))), 9).alias("s2"),
    )


def q_gaussian_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    # r13: persist the ln(x) projection — init + four EM rounds each
    # re-scanned the parquet otherwise. Deliberately NOT repartitioned:
    # the m-step sums are double (order-sensitive); the cache preserves
    # the scan's partitioning, so the fold order — and the oracle hash
    # — are unchanged.
    src = transient_persist(
        load_table(spark, sf_dir, "orders").select(
            F.log(F.col("o_totalprice")).alias("x")
        )
    )
    init = src.agg(
        F.lit(0.5).alias("pi2"),
        F.round(F.expr("percentile(x, 0.25)"), 9).alias("mu1"),
        F.round(F.stddev_samp("x"), 9).alias("s1"),
        F.round(F.expr("percentile(x, 0.75)"), 9).alias("mu2"),
        F.round(F.stddev_samp("x"), 9).alias("s2"),
    )
    params = init.localCheckpoint()
    for _ in range(_EM_ROUNDS):
        params = _em_estep_mstep(src, params).localCheckpoint()
    return params.select(
        F.round("pi2", 5).alias("pi2"),
        F.round("mu1", 5).alias("mu1"),
        F.round("s1", 5).alias("s1"),
        F.round("mu2", 5).alias("mu2"),
        F.round("s2", 5).alias("s2"),
    )


def _em_sql() -> str:
    cte = [
        "src AS (SELECT LN(o_totalprice) AS x FROM orders)",
        """p0 AS (
  SELECT 0.5 AS pi2,
         ROUND(quantile_cont(x, 0.25), 9) AS mu1,
         ROUND(STDDEV_SAMP(x), 9) AS s1,
         ROUND(quantile_cont(x, 0.75), 9) AS mu2,
         ROUND(STDDEV_SAMP(x), 9) AS s2
  FROM src)""",
    ]
    for i in range(_EM_ROUNDS):
        cte.append(
            f"""e{i} AS (
  SELECT x,
         (pi2 * EXP(-(x - mu2) * (x - mu2) / (2.0 * s2 * s2)) / s2)
         / ((1.0 - pi2) * EXP(-(x - mu1) * (x - mu1) / (2.0 * s1 * s1)) / s1
            + pi2 * EXP(-(x - mu2) * (x - mu2) / (2.0 * s2 * s2)) / s2) AS r2
  FROM src CROSS JOIN p{i})"""
        )
        cte.append(
            f"""p{i + 1} AS (
  SELECT ROUND(SUM(r2) / COUNT(*), 9) AS pi2,
         ROUND((SUM(x) - SUM(r2 * x)) / (COUNT(*) - SUM(r2)), 9) AS mu1,
         ROUND(SQRT(GREATEST(
           (SUM(x * x) - SUM(r2 * x * x)) / (COUNT(*) - SUM(r2))
           - POW((SUM(x) - SUM(r2 * x)) / (COUNT(*) - SUM(r2)), 2), 1e-12)), 9) AS s1,
         ROUND(SUM(r2 * x) / SUM(r2), 9) AS mu2,
         ROUND(SQRT(GREATEST(
           SUM(r2 * x * x) / SUM(r2) - POW(SUM(r2 * x) / SUM(r2), 2), 1e-12)), 9) AS s2
  FROM e{i})"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"""
SELECT ROUND(pi2, 5) AS pi2, ROUND(mu1, 5) AS mu1, ROUND(s1, 5) AS s1,
       ROUND(mu2, 5) AS mu2, ROUND(s2, 5) AS s2
FROM p{_EM_ROUNDS}
"""
    )


Q_GAUSSIAN_EM_SQL = _em_sql()

QUERIES["q_gaussian_em"] = QuerySpec(
    q_gaussian_em,
    Q_GAUSSIAN_EM_SQL,
    "two-component Gaussian-mixture EM on ln(price): four unrolled "
    "E/M rounds, ROUND(·,9) parameter pinning between rounds, no "
    "driver numerics",
)

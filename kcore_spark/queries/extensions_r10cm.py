"""Round-10 surface extensions, batch CM (SURVEY §2.3 N r10): the
corpus-linguistics block — Dunning's log-likelihood keyness (which
words are over-represented in one source vs the rest: the corpus
comparison standard, far safer than raw chi-square at small counts),
Kilgarriff's chi-square corpus distance (how DIFFERENT are two
sources' word distributions over the shared top vocabulary), and
Burrows' Delta (the authorship-attribution classic: mean |z| distance
over standardized function-word rates). Completes the corpus-profile
family next to q_unigram_kl_drift / q_vocab_overlap_langs /
q_tfidf_top_terms.

Basis: the corpus-wide top-30 words (function words float to the top
— exactly what Burrows wants), fully tie-broken by word.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: counts are exact integers; per-word fractional terms are
rounded and decimal-summed; the top-K vocabulary and every reported
ranking are fully tie-broken.
Scale: one token-explode scan folds to (source, word) counts; all
pair/keyness math runs on the (sources x 30)-row table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_TOPV = 30
_TOP_PAIRS = 10
_TOP_KEY = 3


def _counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, word, c) over the corpus-wide top-30 vocabulary."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .orderBy(F.col("cw").desc(), "w")
        .limit(_TOPV)
        .select("w")
    )
    return (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


_COUNTS_SQL = f"""
  tok AS (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents),
  tok2 AS (SELECT source, w FROM tok WHERE w <> ''),
  vocab AS (
    SELECT w FROM (
      SELECT w, COUNT(*) AS cw FROM tok2 GROUP BY w
      ORDER BY cw DESC, w LIMIT {_TOPV})),
  counts AS (
    SELECT source, tok2.w AS w, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok2 JOIN vocab ON tok2.w = vocab.w
    GROUP BY 1, 2)
"""


def q_dunning_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cts = _counts(spark, sf_dir)
    word_tot = cts.groupBy("w").agg(F.sum("c").cast("long").alias("cw"))
    src_tot = cts.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    grand = cts.agg(F.sum("c").cast("long").alias("g"))
    j = (
        cts.join(F.broadcast(word_tot), "w")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
    )
    a = F.col("c").cast("double")
    b = (F.col("cw") - F.col("c")).cast("double")
    cs = F.col("cs").cast("double")
    rest = (F.col("g") - F.col("cs")).cast("double")
    e1 = cs * F.col("cw").cast("double") / F.col("g").cast("double")
    e2 = rest * F.col("cw").cast("double") / F.col("g").cast("double")
    ll = 2.0 * (
        F.when(a > 0, a * F.log(a / e1)).otherwise(0.0)
        + F.when(b > 0, b * F.log(b / e2)).otherwise(0.0)
    )
    keyed = j.select(
        "source",
        "w",
        F.round(ll, 6).alias("ll"),
        (a / cs > b / rest).alias("over"),
    ).where(F.col("over"))
    wr = Window.partitionBy("source").orderBy(F.col("ll").desc(), F.col("w"))
    return (
        keyed.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= _TOP_KEY)
        .select("source", F.col("rk").alias("rank"), "w", "ll")
        .orderBy("source", "rank")
    )


Q_KEYNESS_SQL = f"""
WITH {_COUNTS_SQL},
word_tot AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM counts GROUP BY w),
src_tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM counts GROUP BY source),
grand AS (SELECT CAST(SUM(c) AS BIGINT) AS g FROM counts),
keyed AS (
  SELECT counts.source AS source, counts.w AS w,
         ROUND(2.0 * (
           CASE WHEN c > 0 THEN c * LN(c / (CAST(cs AS DOUBLE) * cw / g))
                ELSE 0.0 END
           + CASE WHEN cw - c > 0 THEN
               (cw - c) * LN((cw - c)
                 / (CAST(g - cs AS DOUBLE) * cw / g))
             ELSE 0.0 END), 6) AS ll
  FROM counts
  JOIN word_tot ON counts.w = word_tot.w
  JOIN src_tot ON counts.source = src_tot.source
  CROSS JOIN grand
  WHERE CAST(c AS DOUBLE) / cs > CAST(cw - c AS DOUBLE) / (g - cs)),
ranked AS (
  SELECT source, w, ll,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY ll DESC, w) AS rk
  FROM keyed)
SELECT source, CAST(rk AS INT) AS rank, w, ll
FROM ranked WHERE rk <= {_TOP_KEY}
ORDER BY source, rank
"""

QUERIES["q_dunning_keyness"] = QuerySpec(
    q_dunning_keyness,
    Q_KEYNESS_SQL,
    "Dunning log-likelihood keywords per source (top-3 over-represented "
    "top-vocab words) — (source x word)-sized algebra",
)


def q_kilgarriff_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cts = _counts(spark, sf_dir)
    src_tot = cts.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    a = cts.join(src_tot, "source").select(
        F.col("source").alias("sa"),
        "w",
        F.col("c").alias("ca"),
        F.col("cs").alias("na"),
    )
    b = cts.join(src_tot, "source").select(
        F.col("source").alias("sb"),
        F.col("w").alias("wb"),
        F.col("c").alias("cb"),
        F.col("cs").alias("nb"),
    )
    pairs = a.join(
        b, (F.col("w") == F.col("wb")) & (F.col("sa") < F.col("sb"))
    )
    exp_a = (F.col("ca") + F.col("cb")).cast("double") * F.col("na") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    exp_b = (F.col("ca") + F.col("cb")).cast("double") * F.col("nb") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    term = (F.col("ca") - exp_a) ** 2 / exp_a + (F.col("cb") - exp_b) ** 2 / exp_b
    per_pair = pairs.select(
        "sa", "sb", F.round(term, 10).cast("decimal(38,10)").alias("t")
    ).groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.round(F.sum("t").cast("double"), 6).alias("chi2"),
    )
    return per_pair.orderBy(F.col("chi2").desc(), "sa", "sb").limit(_TOP_PAIRS)


Q_KILGARRIFF_SQL = f"""
WITH {_COUNTS_SQL},
src_tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM counts GROUP BY source),
jc AS (
  SELECT counts.source AS source, w, c, cs
  FROM counts JOIN src_tot ON counts.source = src_tot.source),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, a.w AS w,
         a.c AS ca, b.c AS cb, a.cs AS na, b.cs AS nb
  FROM jc a JOIN jc b ON a.w = b.w AND a.source < b.source),
per_pair AS (
  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n_words,
         ROUND(CAST(SUM(CAST(ROUND(
             POWER(ca - (ca + cb) * CAST(na AS DOUBLE) / (na + nb), 2)
               / ((ca + cb) * CAST(na AS DOUBLE) / (na + nb))
             + POWER(cb - (ca + cb) * CAST(nb AS DOUBLE) / (na + nb), 2)
               / ((ca + cb) * CAST(nb AS DOUBLE) / (na + nb)), 10)
           AS DECIMAL(38,10))) AS DOUBLE), 6) AS chi2
  FROM pairs GROUP BY 1, 2)
SELECT sa, sb, n_words, chi2
FROM per_pair ORDER BY chi2 DESC, sa, sb LIMIT {_TOP_PAIRS}
"""

QUERIES["q_kilgarriff_chi2"] = QuerySpec(
    q_kilgarriff_chi2,
    Q_KILGARRIFF_SQL,
    "Kilgarriff chi-square corpus distance: the 10 most different "
    "source pairs over the shared top vocabulary",
)


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    cts = _counts(spark, sf_dir)
    src_tot = cts.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    rates = cts.join(src_tot, "source").select(
        "source",
        "w",
        (F.col("c").cast("double") / F.col("cs").cast("double") * 1000.0).alias(
            "rate"
        ),
    )
    mom = rates.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.round("rate", 10).cast("decimal(38,10)")).cast("double").alias(
            "sr"
        ),
        F.sum(F.round(F.col("rate") * F.col("rate"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("srr"),
    )
    kd = F.col("k").cast("double")
    mu = F.col("sr") / kd
    sd = F.sqrt((kd * F.col("srr") - F.col("sr") ** 2) / (kd * (kd - 1.0)))
    z = rates.join(F.broadcast(mom), "w").select(
        "source",
        "w",
        ((F.col("rate") - mu) / sd).alias("z"),
    )
    a = z.select(F.col("source").alias("sa"), "w", F.col("z").alias("za"))
    b = z.select(
        F.col("source").alias("sb"), F.col("w").alias("wb"), F.col("z").alias("zb")
    )
    pairs = a.join(b, (F.col("w") == F.col("wb")) & (F.col("sa") < F.col("sb")))
    delta = pairs.select(
        "sa",
        "sb",
        F.round(F.abs(F.col("za") - F.col("zb")), 10)
        .cast("decimal(38,10)")
        .alias("t"),
    ).groupBy("sa", "sb").agg(
        F.round(F.sum("t").cast("double") / F.count(F.lit(1)), 6).alias("delta")
    )
    return delta.orderBy(F.col("delta").asc(), "sa", "sb").limit(_TOP_PAIRS)


Q_BURROWS_SQL = f"""
WITH {_COUNTS_SQL},
src_tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM counts GROUP BY source),
rates AS (
  SELECT counts.source AS source, w,
         CAST(c AS DOUBLE) / CAST(cs AS DOUBLE) * 1000.0 AS rate
  FROM counts JOIN src_tot ON counts.source = src_tot.source),
mom AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(ROUND(rate, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sr,
         CAST(SUM(CAST(ROUND(rate * rate, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS srr
  FROM rates GROUP BY w),
z AS (
  SELECT source, rates.w AS w,
         (rate - sr / k)
           / SQRT((CAST(k AS DOUBLE) * srr - POWER(sr, 2))
                  / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))) AS z
  FROM rates JOIN mom ON rates.w = mom.w),
pairs AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(ROUND(ABS(a.z - b.z), 10) AS DECIMAL(38,10)) AS t
  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source),
delta AS (
  SELECT sa, sb, ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS delta
  FROM pairs GROUP BY 1, 2)
SELECT sa, sb, delta FROM delta ORDER BY delta ASC, sa, sb LIMIT {_TOP_PAIRS}
"""

QUERIES["q_burrows_delta"] = QuerySpec(
    q_burrows_delta,
    Q_BURROWS_SQL,
    "Burrows' Delta stylistic distance: the 10 closest source pairs by "
    "mean |z| over standardized top-vocab rates",
)

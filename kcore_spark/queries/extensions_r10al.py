"""Round-10 surface extensions, batch AL (SURVEY §2.3 N r10): the
lexical-richness block over the documents corpus — Yule's K (the
classic length-robust repeat-rate characteristic), token diversity
(Simpson's D, Shannon H, Pielou evenness per language), and the
hapax profile (V1/V2 counts, hapax ratio, Sichel's S) — the corpus
statistics a tokenizer/data-mixing decision reads first, next to
q_heaps_law (vocabulary growth) and q_burstiness.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: everything reduces to integer token/type counts per
(lang, token); Shannon terms are ROUND(·,12)-pinned decimal sums
over the vocabulary-sized table; one final ROUND per double.
Scale: one token explode -> (lang, token) groupBy (the corpus-sized
shuffle every tokenizer stat pays once), then count-of-counts tables
bounded by max multiplicity. No global sorts, no pairwise work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, token, cnt) — lowercase whitespace tokens, empties out."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), "\\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_TOKENS_SQL = """
  SELECT lang, tok, COUNT(*) AS cnt
  FROM (SELECT lang, UNNEST(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents)
  WHERE tok <> ''
  GROUP BY lang, tok
"""


# ---------------------------------------------------------- Yule's K
# K = 10^4 · (Σ_m m²·V(m) − N) / N², computed from the count-of-counts
# table V(m) (bounded by the max multiplicity, tiny).


def q_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = _token_counts(spark, sf_dir)
    vm = tc.groupBy("lang", "cnt").agg(F.count(F.lit(1)).alias("vm"))
    agg = vm.groupBy("lang").agg(
        F.sum(F.col("cnt") * F.col("vm")).alias("n_tokens"),
        F.sum("vm").alias("n_types"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("vm")).alias("sm2"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(10000.0 * (F.col("sm2").cast("double") - n) / (n * n), 6).alias(
            "yules_k"
        ),
    ).orderBy("lang")


Q_YULES_SQL = f"""
WITH tc AS ({_TOKENS_SQL}),
vm AS (SELECT lang, cnt, COUNT(*) AS vm FROM tc GROUP BY lang, cnt),
agg AS (
  SELECT lang, SUM(cnt * vm) AS n_tokens, SUM(vm) AS n_types,
         SUM(cnt * cnt * vm) AS sm2
  FROM vm GROUP BY lang)
SELECT lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       ROUND(10000.0 * (CAST(sm2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
             / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS yules_k
FROM agg
ORDER BY lang
"""

QUERIES["q_yules_k"] = QuerySpec(
    q_yules_k,
    Q_YULES_SQL,
    "Yule's K repeat-rate per language — count-of-counts table, "
    "integer-exact until the final ratio",
)


# ---------------------------------------------------- token diversity
# Simpson's D = Σ n_i(n_i−1)/(N(N−1)) (integer-exact), Shannon
# H = −Σ p·ln p (pinned decimal sum over the vocabulary), Pielou
# evenness J = H / ln V.


def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = _token_counts(spark, sf_dir)
    totals = tc.groupBy("lang").agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    )
    j = tc.join(F.broadcast(totals), "lang")
    p = F.col("cnt").cast("double") / F.col("n").cast("double")
    agg = j.groupBy("lang").agg(
        F.first("n").alias("n"),
        F.first("v").alias("v"),
        F.sum(F.col("cnt") * (F.col("cnt") - 1)).alias("pairs"),
        F.sum(F.round(-p * F.log(p), 12).cast("decimal(28,12)")).alias("h"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("n_types"),
        F.round(F.col("pairs").cast("double") / (n * (n - 1)), 6).alias("simpson_d"),
        F.round(F.col("h").cast("double"), 6).alias("shannon_h"),
        F.round(
            F.col("h").cast("double") / F.log(F.col("v").cast("double")), 6
        ).alias("evenness"),
    ).orderBy("lang")


Q_DIVERSITY_SQL = f"""
WITH tc AS ({_TOKENS_SQL}),
totals AS (SELECT lang, SUM(cnt) AS n, COUNT(*) AS v FROM tc GROUP BY lang),
agg AS (
  SELECT tc.lang, ANY_VALUE(n) AS n, ANY_VALUE(v) AS v,
         SUM(cnt * (cnt - 1)) AS pairs,
         SUM(CAST(ROUND(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                        * LN(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                  AS DECIMAL(28,12))) AS h
  FROM tc JOIN totals ON tc.lang = totals.lang
  GROUP BY tc.lang)
SELECT lang,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(v AS BIGINT) AS n_types,
       ROUND(CAST(pairs AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS simpson_d,
       ROUND(CAST(h AS DOUBLE), 6) AS shannon_h,
       ROUND(CAST(h AS DOUBLE) / LN(CAST(v AS DOUBLE)), 6) AS evenness
FROM agg
ORDER BY lang
"""

QUERIES["q_token_diversity"] = QuerySpec(
    q_token_diversity,
    Q_DIVERSITY_SQL,
    "Simpson D / Shannon H / Pielou evenness per language — integer "
    "pair counts, pinned-decimal entropy sum",
)


# ------------------------------------------------------- hapax profile
# V1 (hapax), V2 (dis legomena), hapax ratio V1/V, Sichel's S = V2/V.


def q_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = _token_counts(spark, sf_dir)
    agg = tc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("v1"),
        F.sum((F.col("cnt") == 2).cast("long")).alias("v2"),
    )
    return agg.select(
        "lang",
        "v",
        "v1",
        "v2",
        F.round(F.col("v1").cast("double") / F.col("v").cast("double"), 6).alias(
            "hapax_ratio"
        ),
        F.round(F.col("v2").cast("double") / F.col("v").cast("double"), 6).alias(
            "sichel_s"
        ),
    ).orderBy("lang")


Q_HAPAX_SQL = f"""
WITH tc AS ({_TOKENS_SQL})
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS v,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
       CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
       ROUND(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio,
       ROUND(CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS sichel_s
FROM tc
GROUP BY lang
ORDER BY lang
"""

QUERIES["q_hapax_profile"] = QuerySpec(
    q_hapax_profile,
    Q_HAPAX_SQL,
    "hapax/dis-legomena profile per language (V1, V2, Sichel's S) — "
    "one count-of-counts pass",
)

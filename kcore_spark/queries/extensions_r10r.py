"""Round-10 surface extensions, batch R (SURVEY §2.3 N r10): the
readability-family completion — Gunning fog (syllable-run complex
words), the Automated Readability Index (character-based), and
Coleman-Liau (letters/sentences per 100 words). Together with
q_flesch_readability these are the four standard formulas a text-
quality pass scores; all counts are integer regexp arithmetic riding
the scan (JVM expressions, no UDF), per-doc scores rounded then
decimal-averaged per source — the q_flesch conventions verbatim.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _counts():
    lower = F.lower(F.col("text"))
    words = F.size(F.split(lower, " "))
    sentences = F.greatest(
        F.lit(1), F.length(F.regexp_replace(lower, "[^.!?]", ""))
    )
    letters = F.length(F.regexp_replace(lower, "[^a-z]", ""))
    return lower, words, sentences, letters


# --------------------------------------------------- Gunning fog
# fog = 0.4 * (words/sentences + 100 * complex/words), complex =
# words with >= 3 vowel runs (the q_flesch syllable convention).


def q_gunning_fog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    lower, words, sentences, _ = _counts()
    syl = lambda w: F.length(F.regexp_replace(w, "[aeiouy]+", "#")) - F.length(
        F.regexp_replace(F.regexp_replace(w, "[aeiouy]+", "#"), "#", "")
    )
    complex_words = F.size(
        F.filter(F.split(lower, " "), lambda w: syl(w) >= 3)
    )
    fog = F.round(
        F.lit(0.4)
        * (
            words.cast("double") / sentences
            + F.lit(100.0) * complex_words / words
        ),
        9,
    ).cast("decimal(18,9)")
    scored = docs.select("source", fog.alias("fog"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("fog").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_fog"
            ),
        )
        .orderBy("source")
    )


Q_FOG_SQL = """
WITH scored AS (
  SELECT source,
         CAST(ROUND(0.4 * (
           CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
             / GREATEST(1, length(regexp_replace(lower(text), '[^.!?]', '', 'g')))
           + 100.0 * len(list_filter(string_split(lower(text), ' '),
               w -> length(regexp_replace(w, '[aeiouy]+', '#', 'g'))
                    - length(regexp_replace(regexp_replace(w, '[aeiouy]+', '#', 'g'),
                                            '#', '', 'g')) >= 3))
             / len(string_split(lower(text), ' '))
         ), 9) AS DECIMAL(18,9)) AS fog
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(fog) AS DOUBLE) / COUNT(*), 6) AS avg_fog
FROM scored
GROUP BY source
ORDER BY source
"""

QUERIES["q_gunning_fog"] = QuerySpec(
    q_gunning_fog,
    Q_FOG_SQL,
    "Gunning fog index per source (vowel-run complex words, integer "
    "regexp arithmetic) — readability family",
)


# -------------------------------- Automated Readability Index (ARI)
# ari = 4.71 * chars/words + 0.5 * words/sentences - 21.43, with
# chars = letter count (character-based — the signal Flesch/fog
# don't use).


def q_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    _, words, sentences, letters = _counts()
    ari = F.round(
        F.lit(4.71) * letters.cast("double") / words
        + F.lit(0.5) * words.cast("double") / sentences
        - F.lit(21.43),
        9,
    ).cast("decimal(18,9)")
    scored = docs.select("source", ari.alias("ari"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("ari").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_ari"
            ),
        )
        .orderBy("source")
    )


Q_ARI_SQL = """
WITH scored AS (
  SELECT source,
         CAST(ROUND(
           4.71 * CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                       AS DOUBLE)
                / len(string_split(lower(text), ' '))
           + 0.5 * CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
                / GREATEST(1, length(regexp_replace(lower(text), '[^.!?]', '', 'g')))
           - 21.43, 9) AS DECIMAL(18,9)) AS ari
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(ari) AS DOUBLE) / COUNT(*), 6) AS avg_ari
FROM scored
GROUP BY source
ORDER BY source
"""

QUERIES["q_ari"] = QuerySpec(
    q_ari,
    Q_ARI_SQL,
    "Automated Readability Index per source (character-based) — "
    "readability family",
)


# ----------------------------------------------- Coleman-Liau index
# cli = 0.0588 L - 0.296 S - 15.8, L = letters per 100 words,
# S = sentences per 100 words.


def q_coleman_liau(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    _, words, sentences, letters = _counts()
    cli = F.round(
        F.lit(0.0588) * (F.lit(100.0) * letters / words)
        - F.lit(0.296) * (F.lit(100.0) * sentences / words)
        - F.lit(15.8),
        9,
    ).cast("decimal(18,9)")
    scored = docs.select("source", cli.alias("cli"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("cli").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_cli"
            ),
        )
        .orderBy("source")
    )


Q_CLI_SQL = """
WITH scored AS (
  SELECT source,
         CAST(ROUND(
           0.0588 * (100.0 * length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                     / len(string_split(lower(text), ' ')))
           - 0.296 * (100.0 * GREATEST(1, length(regexp_replace(lower(text), '[^.!?]', '', 'g')))
                      / len(string_split(lower(text), ' ')))
           - 15.8, 9) AS DECIMAL(18,9)) AS cli
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(cli) AS DOUBLE) / COUNT(*), 6) AS avg_cli
FROM scored
GROUP BY source
ORDER BY source
"""

QUERIES["q_coleman_liau"] = QuerySpec(
    q_coleman_liau,
    Q_CLI_SQL,
    "Coleman-Liau index per source (letters/sentences per 100 words) "
    "— readability family",
)

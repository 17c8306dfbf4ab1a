"""Round-10 surface extensions, batch CB (SURVEY §2.3 N r10): the
readability/lexical block, third wave — the SMOG grade (polysyllable
density: the clinical-literature standard, completing the formula
family next to q_flesch_readability / q_gunning_fog / q_ari /
q_coleman_liau), the Scandinavian LIX + RIX pair (long-word formulas
that need no syllable heuristic at all), and the segmental type-token
ratio (STTR over 50-token segments — the length-robust lexical
diversity measure that plain TTR is not; sibling of q_token_diversity
/ q_yules_k).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the vowel-run syllable heuristic and whitespace
tokenization are the EXACT q_flesch_readability expressions; per-doc
scores are rounded to 9dp decimals before the per-source average.
Scale: SMOG/LIX are pure JVM regexp/array expressions riding one
documents scan; STTR is one posexplode keyed by (doc, segment) — all
group-bys on bounded keys, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_SEG = 50  # STTR segment length (tokens)


def _syll(w: Column) -> Column:
    """Vowel-run syllable count (the q_flesch_readability heuristic)."""
    collapsed = F.regexp_replace(w, "[aeiouy]+", "#")
    return F.length(collapsed) - F.length(F.regexp_replace(collapsed, "#", ""))


# ------------------------------------------------------------- SMOG
# grade = 1.0430 * sqrt(polysyllables * 30 / sentences) + 3.1291.


def q_smog_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    lower = F.lower(F.col("text"))
    words = F.split(lower, " ")
    poly = F.size(F.filter(words, lambda w: _syll(w) >= 3))
    sentences = F.greatest(
        F.lit(1), F.length(F.regexp_replace(lower, "[^.!?]", ""))
    )
    scored = docs.select(
        "source",
        F.round(
            1.0430
            * F.sqrt(
                poly.cast("double") * (30.0 / sentences.cast("double"))
            )
            + 3.1291,
            9,
        )
        .cast("decimal(18,9)")
        .alias("smog"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("smog").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_smog"
            ),
        )
        .orderBy("source")
    )


Q_SMOG_SQL = """
WITH scored AS (
  SELECT source,
         CAST(ROUND(1.0430 * SQRT(
                CAST(len(list_filter(string_split(lower(text), ' '),
                     w -> length(regexp_replace(w, '[aeiouy]+', '#', 'g'))
                          - length(replace(regexp_replace(w, '[aeiouy]+', '#', 'g'),
                                           '#', '')) >= 3)) AS DOUBLE)
                * (30.0 / CAST(GREATEST(1, length(regexp_replace(lower(text),
                                        '[^.!?]', '', 'g'))) AS DOUBLE)))
                    + 3.1291, 9) AS DECIMAL(18,9)) AS smog
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(smog) AS DOUBLE) / COUNT(*), 6) AS avg_smog
FROM scored GROUP BY source ORDER BY source
"""

QUERIES["q_smog_index"] = QuerySpec(
    q_smog_index,
    Q_SMOG_SQL,
    "SMOG grade per source — vowel-run polysyllable filter as a JVM "
    "array lambda riding the scan",
)


# ---------------------------------------------------------- LIX/RIX
# LIX = words/sentences + 100 * longwords/words; RIX = longwords/sentences
# (long word: > 6 characters).


def q_lix_rix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    lower = F.lower(F.col("text"))
    words = F.split(lower, " ")
    n_w = F.size(words).cast("double")
    n_long = F.size(F.filter(words, lambda w: F.length(w) > 6)).cast("double")
    sentences = F.greatest(
        F.lit(1), F.length(F.regexp_replace(lower, "[^.!?]", ""))
    ).cast("double")
    scored = docs.select(
        "source",
        F.round(n_w / sentences + 100.0 * n_long / n_w, 9)
        .cast("decimal(18,9)")
        .alias("lix"),
        F.round(n_long / sentences, 9).cast("decimal(18,9)").alias("rix"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("lix").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_lix"
            ),
            F.round(F.sum("rix").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_rix"
            ),
        )
        .orderBy("source")
    )


Q_LIX_SQL = """
WITH scored AS (
  SELECT source,
         CAST(ROUND(CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
                    / CAST(GREATEST(1, length(regexp_replace(lower(text),
                            '[^.!?]', '', 'g'))) AS DOUBLE)
                    + 100.0 * CAST(len(list_filter(string_split(lower(text), ' '),
                                   w -> length(w) > 6)) AS DOUBLE)
                      / CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS lix,
         CAST(ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
                        w -> length(w) > 6)) AS DOUBLE)
                    / CAST(GREATEST(1, length(regexp_replace(lower(text),
                            '[^.!?]', '', 'g'))) AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS rix
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(lix) AS DOUBLE) / COUNT(*), 6) AS avg_lix,
       ROUND(CAST(SUM(rix) AS DOUBLE) / COUNT(*), 6) AS avg_rix
FROM scored GROUP BY source ORDER BY source
"""

QUERIES["q_lix_rix"] = QuerySpec(
    q_lix_rix,
    Q_LIX_SQL,
    "LIX + RIX long-word readability per source — pure array/regexp "
    "expressions, one scan",
)


# -------------------------------------------------------------- STTR
# Mean TTR over full non-overlapping 50-token segments.


def q_sttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w"),
    )
    seg = tok.groupBy(
        "doc_id", "source", F.floor(F.col("pos") / _SEG).cast("long").alias("seg")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.countDistinct("w").cast("long").alias("n_types"),
    )
    full = seg.where(F.col("n_tok") == _SEG).select(
        "source",
        F.round(F.col("n_types") / F.lit(float(_SEG)), 9)
        .cast("decimal(18,9)")
        .alias("ttr"),
    )
    return (
        full.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.round(F.sum("ttr").cast("double") / F.count(F.lit(1)), 6).alias(
                "sttr"
            ),
        )
        .orderBy("source")
    )


Q_STTR_SQL = f"""
WITH tok AS (
  SELECT doc_id, source,
         generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos,
         unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
seg AS (
  SELECT doc_id, source, CAST(FLOOR(pos / {_SEG}.0) AS BIGINT) AS seg,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
  FROM tok GROUP BY 1, 2, 3),
full_seg AS (
  SELECT source,
         CAST(ROUND(n_types / {float(_SEG)}, 9) AS DECIMAL(18,9)) AS ttr
  FROM seg WHERE n_tok = {_SEG})
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_segments,
       ROUND(CAST(SUM(ttr) AS DOUBLE) / COUNT(*), 6) AS sttr
FROM full_seg GROUP BY source ORDER BY source
"""

QUERIES["q_sttr"] = QuerySpec(
    q_sttr,
    Q_STTR_SQL,
    "segmental type-token ratio (50-token segments) per source — one "
    "posexplode, (doc, segment)-keyed distinct fold",
)

"""Round-10 surface extensions, batch D (SURVEY §2.3 N r10): the
text-curation block II — unigram-surprisal quality quintiles (the
"perplexity bucket" split a pretraining pipeline uses to stratify a
corpus, with the quintile computed by the DISTRIBUTED exact-rank
machinery), stopword-density profiling, cross-language vocabulary
overlap, and per-language character-class profiles.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: per-token surprisals are rounded to
12 dp then summed as DECIMAL per doc; per-doc densities rounded to
8 dp before decimal averaging; character-class counts are integer
length differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_rank

QUERIES: dict[str, QuerySpec] = {}


# --------------------- unigram-surprisal quality quintiles
# Score each document by mean unigram surprisal -ln c(w)/T (nats) (the
# cheap LM-quality proxy: high = rare-word-heavy, low = boilerplate),
# then split the corpus into 5 equal buckets BY SCORE using
# _dist_rank + exact NTILE fill arithmetic (extensions_r8.py — no
# single-partition window over the corpus). Per-bucket doc counts and
# means are the stratification report. Scale shape: one token explode
# + vocab count (vocabulary-sized shuffle), one broadcast vocab join
# back, the distributed rank, one final 5-row rollup.

_PPL_BUCKETS = 5


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    tok = docs.select("doc_id", F.explode("ws").alias("w")).where(F.col("w") != "")
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = tok.count()
    scored_tok = tok.join(F.broadcast(vocab), "w").select(
        "doc_id",
        F.round(-F.log(F.col("c") / F.lit(float(total))), 12)
        .cast("decimal(28,12)")
        .alias("surp"),
    )
    per_doc = scored_tok.groupBy("doc_id").agg(
        F.round(
            F.sum("surp").cast("double") / F.count(F.lit(1)), 8
        ).alias("mean_surprisal")
    )
    per_doc = per_doc.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "n_chars"), "doc_id"
    )
    n = per_doc.count()
    q, r = divmod(n, _PPL_BUCKETS)
    ranked = _dist_rank(per_doc, [F.col("mean_surprisal"), F.col("doc_id")])
    binned = ranked.withColumn(
        "bucket",
        (
            F.when(F.col("rk") <= r * (q + 1), (F.col("rk") - 1) / (q + 1))
            .otherwise(r + (F.col("rk") - r * (q + 1) - 1) / q)
            .cast("long")
            + 1
        ).cast("int"),
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.avg(
                    F.round(F.col("mean_surprisal"), 8).cast("decimal(18,8)")
                ).cast("double"),
                6,
            ).alias("avg_surprisal"),
            F.round(F.avg(F.col("n_chars").cast("decimal(18,0)")).cast("double"), 4)
            .alias("avg_chars"),
        )
        .orderBy("bucket")
    )


Q_PPL_SQL = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w
  FROM documents),
tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
vocab AS (SELECT w, COUNT(*) AS c FROM tok2 GROUP BY w),
tot AS (SELECT COUNT(*) AS t FROM tok2),
scored AS (
  SELECT t2.doc_id,
         CAST(ROUND(-ln(c * 1.0 / t), 12) AS DECIMAL(28,12)) AS surp
  FROM tok2 t2 JOIN vocab USING (w) CROSS JOIN tot),
per_doc AS (
  SELECT s.doc_id,
         ROUND(CAST(SUM(surp) AS DOUBLE) / COUNT(*), 8) AS mean_surprisal
  FROM scored s GROUP BY s.doc_id),
joined AS (
  SELECT p.doc_id, p.mean_surprisal, d.n_chars
  FROM per_doc p JOIN documents d USING (doc_id)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY mean_surprisal, doc_id) AS rk,
         COUNT(*) OVER () AS n
  FROM joined),
binned AS (
  SELECT *, CAST(NTILE({_PPL_BUCKETS}) OVER (ORDER BY mean_surprisal, doc_id)
                 AS INTEGER) AS bucket
  FROM ranked)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(AVG(CAST(ROUND(mean_surprisal, 8) AS DECIMAL(18,8)))
                  AS DOUBLE), 6) AS avg_surprisal,
       ROUND(CAST(AVG(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE), 4) AS avg_chars
FROM binned
GROUP BY bucket
ORDER BY bucket
"""

QUERIES["q_perplexity_buckets"] = QuerySpec(
    q_perplexity_buckets,
    Q_PPL_SQL,
    "unigram-surprisal quality quintiles of the corpus (distributed "
    "exact NTILE, no global window) — pretraining stratification",
)


# ------------------------------------ stopword-density profiling
# Density of a pinned function-word list per document, profiled per
# language — the classic cheap quality signal (too low = keyword
# spam, too high = boilerplate). One explode-free scan: counts come
# from array_size(filter(...)); per-doc density rounded to 8 dp then
# decimal-averaged per language.

_STOPWORDS = ["the", "a", "of", "to", "and", "in"]


def q_stopword_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    n_tok = F.size(F.filter(F.col("ws"), lambda w: w != ""))
    n_stop = F.size(F.filter(F.col("ws"), lambda w: F.array_contains(sw, w)))
    d = docs.select(
        "lang",
        F.round(n_stop / n_tok, 8).cast("decimal(18,8)").alias("density"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("density").cast("double"), 6).alias("avg_density"),
            F.min("density").cast("double").alias("min_density"),
            F.max("density").cast("double").alias("max_density"),
        )
        .orderBy("lang")
    )


Q_STOP_SQL = f"""
WITH d AS (
  SELECT lang,
         CAST(ROUND(
           len(list_filter(string_split(lower(text), ' '),
                           w -> list_contains({_STOPWORDS!r}, w))) * 1.0
           / len(list_filter(string_split(lower(text), ' '), w -> w <> '')),
           8) AS DECIMAL(18,8)) AS density
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(AVG(density) AS DOUBLE), 6) AS avg_density,
       CAST(MIN(density) AS DOUBLE) AS min_density,
       CAST(MAX(density) AS DOUBLE) AS max_density
FROM d
GROUP BY lang
ORDER BY lang
"""

QUERIES["q_stopword_density"] = QuerySpec(
    q_stopword_density,
    Q_STOP_SQL,
    "stopword-density profile per language (function-word ratio per "
    "doc, decimal-averaged) — the cheap quality signal",
)


# ------------------------------ cross-language vocabulary overlap
# Pairwise Jaccard of per-language vocabularies — the contamination /
# code-switching audit for a multilingual corpus. Distinct (lang,
# word) pairs, one self-equi-join on word (vocabulary-sized, never
# row-sized), union via inclusion-exclusion.


def q_vocab_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = docs.distinct()
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("v"))
    a = vocab.select(F.col("lang").alias("lang_a"), "w")
    b = vocab.select(F.col("lang").alias("lang_b"), "w")
    inter = (
        a.join(b, "w")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("lang").alias("lang_a"), F.col("v").alias("v_a"))),
            "lang_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("lang").alias("lang_b"), F.col("v").alias("v_b"))),
            "lang_b",
        )
    )
    return out.select(
        "lang_a",
        "lang_b",
        F.col("v_a").cast("long").alias("v_a"),
        F.col("v_b").cast("long").alias("v_b"),
        F.col("inter").cast("long").alias("n_common"),
        F.round(
            F.col("inter") / (F.col("v_a") + F.col("v_b") - F.col("inter")), 6
        ).alias("jaccard"),
    ).orderBy("lang_a", "lang_b")


Q_VOCAB_SQL = """
WITH tok AS (
  SELECT DISTINCT lang, UNNEST(string_split(lower(text), ' ')) AS w
  FROM documents),
vocab AS (SELECT lang, w FROM tok WHERE w <> ''),
sizes AS (SELECT lang, COUNT(*) AS v FROM vocab GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_common
  FROM vocab a JOIN vocab b ON a.w = b.w AND a.lang < b.lang
  GROUP BY a.lang, b.lang)
SELECT i.lang_a, i.lang_b,
       CAST(sa.v AS BIGINT) AS v_a, CAST(sb.v AS BIGINT) AS v_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       ROUND(i.n_common * 1.0 / (sa.v + sb.v - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.lang = i.lang_a
JOIN sizes sb ON sb.lang = i.lang_b
ORDER BY i.lang_a, i.lang_b
"""

QUERIES["q_vocab_overlap_langs"] = QuerySpec(
    q_vocab_overlap_langs,
    Q_VOCAB_SQL,
    "pairwise Jaccard of per-language vocabularies (vocab-sized "
    "self-join) — the multilingual contamination audit",
)


# ------------------------------ per-language character-class profile
# Letter / digit / space / punctuation shares per language, computed
# as integer length-differences under regexp_replace (no explode, no
# UDF — pure codegen riding the scan). The spam/markup smoke test.


def q_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    n_all = F.length(t)
    n_letter = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_space = F.length(F.regexp_replace(t, "[^ ]", ""))
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        n_all.alias("n_all"),
        n_letter.alias("n_letter"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
    )
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_all").alias("chars"),
        F.sum("n_letter").alias("letters"),
        F.sum("n_digit").alias("digits"),
        F.sum("n_space").alias("spaces"),
    )
    return per.select(
        "lang",
        "n_docs",
        F.col("chars").cast("long").alias("chars"),
        F.round(F.col("letters") / F.col("chars"), 6).alias("letter_share"),
        F.round(F.col("digits") / F.col("chars"), 6).alias("digit_share"),
        F.round(F.col("spaces") / F.col("chars"), 6).alias("space_share"),
        F.round(
            (F.col("chars") - F.col("letters") - F.col("digits") - F.col("spaces"))
            / F.col("chars"),
            6,
        ).alias("other_share"),
    ).orderBy("lang")


Q_CHARCLASS_SQL = """
WITH d AS (
  SELECT lang, LENGTH(text) AS n_all,
         LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_letter,
         LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS n_space
  FROM documents),
per AS (
  SELECT lang, COUNT(*) AS n_docs, SUM(n_all) AS chars,
         SUM(n_letter) AS letters, SUM(n_digit) AS digits,
         SUM(n_space) AS spaces
  FROM d GROUP BY lang)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(chars AS BIGINT) AS chars,
       ROUND(letters * 1.0 / chars, 6) AS letter_share,
       ROUND(digits * 1.0 / chars, 6) AS digit_share,
       ROUND(spaces * 1.0 / chars, 6) AS space_share,
       ROUND((chars - letters - digits - spaces) * 1.0 / chars, 6)
         AS other_share
FROM per
ORDER BY lang
"""

QUERIES["q_char_class_profile"] = QuerySpec(
    q_char_class_profile,
    Q_CHARCLASS_SQL,
    "character-class shares per language (regexp length differences, "
    "no UDF) — the spam/markup smoke test",
)

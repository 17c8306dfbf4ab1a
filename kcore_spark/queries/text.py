"""Text-analysis queries over `documents` (SURVEY §2.3 J).

Spark side uses only JVM column expressions (operators/text.py); the
oracle replicates the arithmetic with DuckDB regex/list functions.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.caching import transient_persist
from kcore_spark.catalog import load_table
from kcore_spark.operators import text as T
from kcore_spark.queries import QuerySpec

# -------------------------------------------------- per-doc stats


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_words = T.word_count("text")
    chars_nospace = F.length(F.regexp_replace("text", "\\s", "")).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("len_chars"),
        n_words.alias("n_words"),
        chars_nospace.alias("chars_nospace"),
        (chars_nospace.cast("double") / n_words.cast("double")).alias("avg_word_len"),
        T.token_count("text").alias("n_tokens"),
    )


Q_TEXT_STATS_SQL = """
SELECT doc_id, lang,
       LENGTH(text) AS len_chars,
       LEN(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS n_words,
       LENGTH(regexp_replace(text, '\\s', '', 'g')) AS chars_nospace,
       CAST(LENGTH(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         / LEN(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS avg_word_len,
       LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens
FROM documents
"""

# -------------------------------------------------- quality scoring


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    score = T.quality_score("text", "n_chars")
    bucket = F.floor(score * 10).cast("long")
    return (
        docs.select("lang", "source", bucket.alias("q_bucket"))
        .groupBy("lang", "q_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "q_bucket")
    )


Q_TEXT_QUALITY_SQL = """
WITH scored AS (
  SELECT lang,
         LEAST(CAST(n_chars AS DOUBLE) / 400.0, 1.0) * 0.5
         + (1.0 - LEAST(CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                        / GREATEST(CAST(n_chars AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
         + LEAST(CAST(LEN(regexp_extract_all(text,
                  '\\b(the|a|of|and|to|in|is|that|it|for)\\b')) AS DOUBLE)
                 / GREATEST(CAST(LEN(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS DOUBLE), 1.0) * 4.0,
                 1.0) * 0.3
         AS score
  FROM documents)
SELECT lang, CAST(FLOOR(score * 10) AS BIGINT) AS q_bucket, COUNT(*) AS n
FROM scored
GROUP BY lang, q_bucket
"""

# -------------------------------------------------- token counts by source


def q_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count("text")).alias("total_tokens"),
            F.sum(T.word_count("text")).alias("total_words"),
            F.max(F.length("text").cast("long")).alias("max_chars"),
        )
        .orderBy("source")
    )


Q_TOKEN_TOTALS_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
           AS total_tokens,
       CAST(SUM(LEN(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))) AS BIGINT) AS total_words,
       MAX(LENGTH(text)) AS max_chars
FROM documents
GROUP BY source
"""

# -------------------------------------------------- language ID heuristic


def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = {lang: T.stopword_hits("text", lang) for lang in T.LANG_MARKERS}
    # argmax with deterministic tie-break in LANG_MARKERS order
    pred = F.lit(None).cast("string")
    best = F.lit(-1).cast("long")
    for lang in T.LANG_MARKERS:
        better = hits[lang] > best
        pred = F.when(better, F.lit(lang)).otherwise(pred)
        best = F.when(better, hits[lang]).otherwise(best)
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


def _lang_hits_sql(lang: str) -> str:
    return (
        f"LEN(regexp_extract_all(text, '\\b{T.LANG_MARKERS[lang]}\\b'))"
    )


Q_LANG_ID_SQL = f"""
WITH scored AS (
  SELECT lang,
         {_lang_hits_sql("en")} AS h_en,
         {_lang_hits_sql("de")} AS h_de,
         {_lang_hits_sql("es")} AS h_es,
         {_lang_hits_sql("fr")} AS h_fr,
         {_lang_hits_sql("zh")} AS h_zh
  FROM documents),
pred AS (
  SELECT lang,
         CASE
           WHEN h_zh > h_en AND h_zh > h_de AND h_zh > h_es AND h_zh > h_fr THEN 'zh'
           WHEN h_fr > h_en AND h_fr > h_de AND h_fr > h_es THEN 'fr'
           WHEN h_es > h_en AND h_es > h_de THEN 'es'
           WHEN h_de > h_en THEN 'de'
           ELSE 'en'
         END AS pred_lang
  FROM scored)
SELECT lang, pred_lang, COUNT(*) AS n
FROM pred
GROUP BY lang, pred_lang
"""

# -------------------------------------------------- document fingerprint


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint("text").alias("fp")).orderBy("doc_id")


Q_FINGERPRINTS_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
                          w -> ('0x' || substring(md5(w), 1, 8))::BIGINT)),
         (a, x) -> (a * 31 + x) % 1000000007) AS fp
FROM documents
"""


# -------------------------------------------------- curation pipeline
# The end-to-end training-data admission filter, composed from the
# individual operators: quality gate + language agreement + token
# bounds + exact-dup canonicalization, rolled up per source. This is
# the query a data-curation job runs nightly; every predicate is a
# column expression, the only shuffles are the dedup window and the
# final per-source aggregate.


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    duplicate n-gram fraction — 1 − distinct/total 3-grams — plus the
    top-word dominance ratio. Pure per-row array expressions: the whole
    filter is map-side, NO shuffle until the final per-source rollup,
    so at 100 TB it rides the documents scan for free.

    Output per source: docs flagged repetitious (dup 3-gram fraction
    > 0.2 or top-word ratio > 0.3) vs total."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array BEFORE any lambda references it:
    # inside a HOF lambda, a collapsed-in split() expression re-runs
    # per element (the word_shingles pitfall). A plain two-step select
    # would be re-merged by CollapseProject, so the tokenized
    # projection is persisted — the lambdas then read a stored column.
    # (At 100 TB the same barrier is a materialized tokenized table,
    # or the explode pipeline word_shingles uses, whose Generator
    # blocks the collapse naturally.)
    pre = docs.select(
        "source",
        F.array_remove(F.split("text", T.WORD_SPLIT), "").alias("ws"),
    )
    pre = transient_persist(pre)
    ws = F.col("ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i, 3)),
    )
    n_grams = F.size(grams)
    dup_frac = F.when(
        n_grams > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))
    # top-word dominance: occurrences of the most frequent word / total.
    # Computed as the longest equal run of the SORTED array in one
    # aggregate fold — the naive transform(distinct, w -> count(ws, w))
    # references ws inside a lambda, and HOF lambdas don't share outer
    # subexpressions, so the whole tokenization re-ran per distinct
    # word (measured ~8× slower; the quantize_int8 pitfall). The fold's
    # lambdas touch only the accumulator and the element.
    top_count = F.aggregate(
        F.array_sort(ws),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_ratio = F.when(
        F.size(ws) > 0, top_count.cast("double") / F.size(ws).cast("double")
    ).otherwise(F.lit(0.0))
    flagged = (dup_frac > 0.2) | (top_ratio > 0.3)
    return (
        pre.select("source", flagged.alias("rep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("rep").cast("long")).alias("n_repetitious"),
        )
        .orderBy("source")
    )


Q_GOPHER_REPETITION_SQL = """
WITH g AS (
  SELECT source, ws,
         CASE WHEN len(ws) >= 3
              THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                    FOR i IN generate_series(1, len(ws) - 2)]
              ELSE [] END AS grams
  FROM (SELECT source,
               list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
        FROM documents)),
scored AS (
  SELECT source,
         CASE WHEN len(grams) > 0
              THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
              ELSE 0.0 END AS dup_frac,
         CASE WHEN len(ws) > 0
              THEN CAST(list_max(list_transform(list_distinct(ws),
                     w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / len(ws)
              ELSE 0.0 END AS top_ratio
  FROM g)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dup_frac > 0.2 OR top_ratio > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitious
FROM scored
GROUP BY source
ORDER BY source
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    score = T.quality_score("text", "n_chars")
    tok = T.token_count("text")
    hits = {lang: T.stopword_hits("text", lang) for lang in T.LANG_MARKERS}
    pred = F.lit(None).cast("string")
    best = F.lit(-1).cast("long")
    for lang in T.LANG_MARKERS:
        better = hits[lang] > best
        pred = F.when(better, F.lit(lang)).otherwise(pred)
        best = F.when(better, hits[lang]).otherwise(best)
    canonical = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(F.sha2("text", 256))
    )
    kept = (
        (score >= 0.5)
        & (pred == F.col("lang"))
        & tok.between(10, 2000)
        & canonical
    )
    return (
        docs.select("source", kept.alias("kept"), tok.alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("tok")).otherwise(F.lit(0))).alias("kept_tokens"),
        )
        .orderBy("source")
    )


Q_CORPUS_CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, lang, text,
         LEAST(CAST(n_chars AS DOUBLE) / 400.0, 1.0) * 0.5
         + (1.0 - LEAST(CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                        / GREATEST(CAST(n_chars AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
         + LEAST(CAST(LEN(regexp_extract_all(text,
                  '\\b(the|a|of|and|to|in|is|that|it|for)\\b')) AS DOUBLE)
                 / GREATEST(CAST(LEN(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS DOUBLE), 1.0) * 4.0,
                 1.0) * 0.3 AS score,
         CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS tok,
         {_lang_hits_sql("en")} AS h_en,
         {_lang_hits_sql("de")} AS h_de,
         {_lang_hits_sql("es")} AS h_es,
         {_lang_hits_sql("fr")} AS h_fr,
         {_lang_hits_sql("zh")} AS h_zh,
         MIN(doc_id) OVER (PARTITION BY sha256(text)) AS canon
  FROM documents),
flagged AS (
  SELECT source, tok,
         (score >= 0.5
          AND CASE
                WHEN h_zh > h_en AND h_zh > h_de AND h_zh > h_es AND h_zh > h_fr THEN 'zh'
                WHEN h_fr > h_en AND h_fr > h_de AND h_fr > h_es THEN 'fr'
                WHEN h_es > h_en AND h_es > h_de THEN 'es'
                WHEN h_de > h_en THEN 'de'
                ELSE 'en'
              END = lang
          AND tok BETWEEN 10 AND 2000
          AND doc_id = canon) AS kept
  FROM scored)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flagged
GROUP BY source
"""


QUERIES = {
    "q_text_stats": QuerySpec(q_text_stats, Q_TEXT_STATS_SQL, "per-doc char/word/token stats"),
    "q_text_quality": QuerySpec(q_text_quality, Q_TEXT_QUALITY_SQL, "quality-score buckets"),
    "q_token_totals": QuerySpec(q_token_totals, Q_TOKEN_TOTALS_SQL, "token counting"),
    "q_lang_id_confusion": QuerySpec(q_lang_id_confusion, Q_LANG_ID_SQL, "language-ID heuristic"),
    "q_fingerprints": QuerySpec(q_fingerprints, Q_FINGERPRINTS_SQL, "rolling-hash fingerprint"),
    "q_corpus_curation": QuerySpec(
        q_corpus_curation, Q_CORPUS_CURATION_SQL, "end-to-end training-data admission filter"
    ),
    "q_gopher_repetition": QuerySpec(
        q_gopher_repetition, Q_GOPHER_REPETITION_SQL, "Gopher repetition filters (dup n-grams)"
    ),
}

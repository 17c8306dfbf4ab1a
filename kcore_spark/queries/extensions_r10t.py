"""Round-10 surface extensions, batch T (SURVEY §2.3 N r10): the
pretraining-prep block II — the T5-style span-corruption plan (how
many spans/sentinels/target tokens a 15%/mean-3 corruption produces
per doc, the arithmetic a denoising-objective builder runs before
materializing anything) and the tokenizer OOV-rate audit against the
corpus' own top-K vocabulary (the coverage check before freezing a
vocab).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer token arithmetic end-to-end; the OOV vocabulary
cut uses (count desc, word asc) tie-broken ranking over the bounded
vocab table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_CORRUPT_RATE_PCT = 15  # percent of tokens masked
_MEAN_SPAN = 3


# ----------------------------------- T5 span-corruption plan
# Per doc with n tokens: masked = floor(n * 15%), spans =
# max(1, floor(masked / 3)) when masked > 0, inputs keep
# n - masked + spans sentinel tokens, targets hold masked + spans
# tokens — the exact bookkeeping of the T5 denoising objective.
# Pure integer arithmetic riding the scan; per-source rollup.


def q_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
        ).alias("n_tok"),
    )
    masked = F.expr(f"n_tok * {_CORRUPT_RATE_PCT} div 100")
    spans = F.when(masked > 0, F.greatest(F.lit(1), F.expr(
        f"(n_tok * {_CORRUPT_RATE_PCT} div 100) div {_MEAN_SPAN}"
    ))).otherwise(F.lit(0))
    d = docs.select(
        "source",
        "n_tok",
        masked.alias("masked"),
        spans.alias("spans"),
    ).withColumn(
        "input_len", F.col("n_tok") - F.col("masked") + F.col("spans")
    ).withColumn("target_len", F.col("masked") + F.col("spans"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens"),
            F.sum("masked").cast("long").alias("masked_tokens"),
            F.sum("spans").cast("long").alias("n_spans"),
            F.sum("input_len").cast("long").alias("input_tokens"),
            F.sum("target_len").cast("long").alias("target_tokens"),
        )
        .orderBy("source")
    )


Q_SPAN_SQL = f"""
WITH docs AS (
  SELECT source,
         len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           AS n_tok
  FROM documents),
plan AS (
  SELECT source, n_tok,
         (n_tok * {_CORRUPT_RATE_PCT}) // 100 AS masked,
         CASE WHEN (n_tok * {_CORRUPT_RATE_PCT}) // 100 > 0
              THEN GREATEST(1, ((n_tok * {_CORRUPT_RATE_PCT}) // 100)
                               // {_MEAN_SPAN})
              ELSE 0 END AS spans
  FROM docs)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tokens,
       CAST(SUM(masked) AS BIGINT) AS masked_tokens,
       CAST(SUM(spans) AS BIGINT) AS n_spans,
       CAST(SUM(n_tok - masked + spans) AS BIGINT) AS input_tokens,
       CAST(SUM(masked + spans) AS BIGINT) AS target_tokens
FROM plan
GROUP BY source
ORDER BY source
"""

QUERIES["q_span_corruption_plan"] = QuerySpec(
    q_span_corruption_plan,
    Q_SPAN_SQL,
    "T5 span-corruption bookkeeping per source (15% rate, mean span "
    "3, sentinel accounting) — denoising-objective planning",
)


# --------------------------------- tokenizer OOV-rate audit (top-K)
# Freeze the corpus' own top-512 words (count desc, word asc) as the
# vocabulary; report per-language the share of token OCCURRENCES
# falling outside it — the coverage number that decides vocab size.
# Vocabulary-sized rank (bounded), broadcast semi-join back.

_VOCAB_K = 512


def q_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w"))
    top = vocab.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") <= _VOCAB_K
    ).select("w")
    hit = tok.join(F.broadcast(top).withColumn("in_v", F.lit(1)), "w", "left")
    return (
        hit.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(F.col("n_oov") / F.col("n_tokens").cast("double"), 6),
        )
        .orderBy("lang")
    )


Q_OOV_SQL = f"""
WITH tok AS (
  SELECT lang, UNNEST(string_split(lower(text), ' ')) AS w
  FROM documents),
tok2 AS (SELECT lang, w FROM tok WHERE w <> ''),
vocab AS (SELECT w, COUNT(*) AS c FROM tok2 GROUP BY w),
top AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM vocab)
  WHERE rk <= {_VOCAB_K})
SELECT t.lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(SUM(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM tok2 t LEFT JOIN top ON top.w = t.w
GROUP BY t.lang
ORDER BY t.lang
"""

QUERIES["q_tokenizer_oov_rate"] = QuerySpec(
    q_tokenizer_oov_rate,
    Q_OOV_SQL,
    "OOV token-occurrence rate per language against the corpus' own "
    "top-512 vocabulary — the vocab-coverage audit",
)

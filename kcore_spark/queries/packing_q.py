"""Training-sequence assembly queries: overlapping chunking and greedy
token packing over the ``documents`` table.

Chunking is value-checked against a DuckDB generate_series rewrite;
packing — an inherently sequential per-group fold — is value-checked
against a DuckDB RECURSIVE CTE that walks each language group in the
same doc_id order with the same fill rule, proving the applyInPandas
fold computes the textbook greedy layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators import text as T
from kcore_spark.operators.packing import chunk_documents, pack_greedy
from kcore_spark.queries import QuerySpec

CHUNK_SIZE = 200
CHUNK_OVERLAP = 50
PACK_BUDGET = 512


def q_doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 200/50 chunking; summarized per document so the
    result stays compact (per-chunk rows are ~5× the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", "text", size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").alias("total_chunk_chars"),
            F.min("chunk_len").alias("tail_len"),
        )
        .orderBy("doc_id")
    )


Q_DOC_CHUNKS_SQL = f"""
WITH chunks AS (
  SELECT doc_id,
         gs.i AS chunk_idx,
         SUBSTRING(text, CAST(gs.i AS INT) * {CHUNK_SIZE - CHUNK_OVERLAP} + 1, {CHUNK_SIZE}) AS chunk_text
  FROM documents,
       LATERAL (SELECT UNNEST(generate_series(0, GREATEST(CAST(FLOOR((LENGTH(text) - {CHUNK_SIZE} + {CHUNK_SIZE - CHUNK_OVERLAP} - 1) / {CHUNK_SIZE - CHUNK_OVERLAP}) AS BIGINT), 0))) AS i) gs
  WHERE LENGTH(text) > 0)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(LENGTH(chunk_text)) AS BIGINT) AS total_chunk_chars,
       CAST(MIN(LENGTH(chunk_text)) AS BIGINT) AS tail_len
FROM chunks
GROUP BY doc_id
ORDER BY doc_id
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 512-token packing of documents per language, in doc_id
    order — the deterministic pre-training sequence layout."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", T.word_count("text").alias("n_tokens")
    )
    packed = pack_greedy(docs, "lang", "doc_id", "n_tokens", budget=PACK_BUDGET)
    return packed.select("lang", "doc_id", "n_tokens", "seq_id", "seq_fill").orderBy(
        "lang", "doc_id"
    )


# The recursive oracle walks each language in doc_id order carrying
# (seq_id, fill), applying the identical rule: if fill>0 and
# fill + w > budget → new sequence. Recursion depth = the largest
# language group; fine at oracle scale.
Q_PACK_SEQUENCES_SQL = f"""
WITH RECURSIVE docs AS (
  SELECT lang, doc_id,
         CAST(LEN(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents),
pack AS (
  SELECT lang, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS seq_id, n_tokens AS seq_fill
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.lang, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.seq_fill > 0 AND p.seq_fill + d.n_tokens > {PACK_BUDGET}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.seq_fill > 0 AND p.seq_fill + d.n_tokens > {PACK_BUDGET}
              THEN d.n_tokens ELSE p.seq_fill + d.n_tokens END
  FROM pack p JOIN docs d ON d.lang = p.lang AND d.rn = p.rn + 1)
SELECT lang, doc_id, n_tokens, seq_id, seq_fill
FROM pack
ORDER BY lang, doc_id
"""


QUERIES = {
    "q_doc_chunks_overlap": QuerySpec(
        q_doc_chunks_overlap, Q_DOC_CHUNKS_SQL, "overlapping 200/50 doc chunking"
    ),
    "q_pack_sequences": QuerySpec(
        q_pack_sequences, Q_PACK_SEQUENCES_SQL, "greedy 512-token sequence packing"
    ),
}

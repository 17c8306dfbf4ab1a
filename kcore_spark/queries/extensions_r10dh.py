"""Round-10 surface extensions, batch DH (SURVEY §2.3 N r10): the
concat-and-chunk pretraining-prep block — the GPT-style pipeline that
concatenates documents in corpus order and slices fixed 2048-token
sequences, audited in closed form from the token-count cumsum (the
_dist_cumsum pattern — no sequence is ever materialized). Truncation
loss (tokens lost if docs were instead HARD-TRUNCATED at 512/1024/2048),
concat boundary stats (how many docs straddle a sequence boundary, how
many sequences hold a boundary), and attention contamination (the
share of within-sequence attention pairs that cross a document
boundary — what document-masking would save). Completes the family
next to q_pack_sequences / q_padding_waste / q_span_corruption_plan /
q_chinchilla_plan.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: token counts are whitespace counts (the repo convention);
offsets are exact integers from the distributed cumsum; pair counts
are exact integer algebra.
Scale: one documents scan + _dist_cumsum (range repartition, no global
window); per-sequence stats are keyed group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_cumsum

QUERIES: dict[str, QuerySpec] = {}

_SEQ = 2048
_CUTS = [512, 1024, 2048]


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
        .cast("long")
        .alias("n_tok"),
    )


_TOK_SQL = """
  dt AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
                AS BIGINT) AS n_tok
    FROM documents)
"""


def q_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    dt = _doc_tokens(spark, sf_dir)
    grid = F.array(*[F.lit(c) for c in _CUTS])
    fan = dt.select("n_tok", F.explode(grid).alias("max_len"))
    return (
        fan.groupBy("max_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_tok") > F.col("max_len")).cast("long")).alias(
                "n_truncated"
            ),
            F.sum(F.col("n_tok")).cast("long").alias("tokens_total"),
            F.sum(
                F.greatest(F.col("n_tok") - F.col("max_len"), F.lit(0))
            )
            .cast("long")
            .alias("tokens_lost"),
        )
        .select(
            "max_len",
            "n_docs",
            "n_truncated",
            "tokens_total",
            "tokens_lost",
            F.round(
                F.col("tokens_lost") / F.col("tokens_total").cast("double"), 6
            ).alias("loss_share"),
        )
        .orderBy("max_len")
    )


Q_TRUNC_SQL = f"""
WITH {_TOK_SQL},
fan AS (
  SELECT n_tok, max_len
  FROM dt CROSS JOIN
    (SELECT UNNEST([{", ".join(str(c) for c in _CUTS)}]) AS max_len) g)
SELECT max_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_tok > max_len THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(GREATEST(n_tok - max_len, 0)) AS BIGINT) AS tokens_lost,
       ROUND(SUM(GREATEST(n_tok - max_len, 0))
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS loss_share
FROM fan GROUP BY max_len ORDER BY max_len
"""

QUERIES["q_truncation_loss"] = QuerySpec(
    q_truncation_loss,
    Q_TRUNC_SQL,
    "hard-truncation audit at 512/1024/2048 — docs cut and token mass "
    "lost per max_len",
)


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (sequence, doc) segment lengths under concat-then-chunk:
    docs concatenated in doc_id order, sliced every 2048 tokens."""
    dt = _doc_tokens(spark, sf_dir).where(F.col("n_tok") > 0)
    cum = _dist_cumsum(dt, [F.col("doc_id")], "n_tok", out_col="cum_incl")
    spans = cum.select(
        "doc_id",
        "n_tok",
        (F.col("cum_incl") - F.col("n_tok")).alias("start"),
        (F.col("cum_incl") - 1).alias("last"),
    )
    # a doc occupies sequences floor(start/SEQ) .. floor(last/SEQ);
    # fan out one row per touched sequence with the overlap length
    fan = spans.select(
        "doc_id",
        "start",
        "last",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / _SEQ).cast("long"),
                F.floor(F.col("last") / _SEQ).cast("long"),
            )
        ).alias("seq_id"),
    )
    return fan.select(
        "doc_id",
        "seq_id",
        (
            F.least(F.col("last"), (F.col("seq_id") + 1) * _SEQ - 1)
            - F.greatest(F.col("start"), F.col("seq_id") * _SEQ)
            + 1
        ).alias("seg_len"),
    )


_SEG_SQL = f"""
  dt0 AS (SELECT doc_id, n_tok FROM dt WHERE n_tok > 0),
  cum AS (
    SELECT doc_id, n_tok,
           SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               AS cum_incl
    FROM dt0),
  spans AS (
    SELECT doc_id, n_tok, cum_incl - n_tok AS start, cum_incl - 1 AS last
    FROM cum),
  segs AS (
    SELECT doc_id, t.seq_id,
           LEAST(last, (t.seq_id + 1) * {_SEQ} - 1)
             - GREATEST(start, t.seq_id * {_SEQ}) + 1 AS seg_len
    FROM spans,
         UNNEST(generate_series(CAST(FLOOR(start / {_SEQ}.0) AS BIGINT),
                                CAST(FLOOR(last / {_SEQ}.0) AS BIGINT)))
             AS t(seq_id))
"""


def q_concat_boundary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = _segments(spark, sf_dir)
    per_doc = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs")
    )
    doc_stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_seqs") > 1).cast("long")).alias("n_docs_split"),
    )
    per_seq = segs.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_in_seq")
    )
    seq_stats = per_seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_sequences"),
        F.sum((F.col("n_docs_in_seq") > 1).cast("long")).alias(
            "n_seqs_with_boundary"
        ),
        F.round(
            F.sum(F.col("n_docs_in_seq")).cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_docs_per_seq"),
    )
    return doc_stats.crossJoin(F.broadcast(seq_stats)).select(
        "n_docs",
        "n_docs_split",
        F.round(
            F.col("n_docs_split") / F.col("n_docs").cast("double"), 6
        ).alias("doc_split_share"),
        "n_sequences",
        "n_seqs_with_boundary",
        "mean_docs_per_seq",
    )


Q_BOUNDARY_SQL = f"""
WITH {_TOK_SQL},
{_SEG_SQL},
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seqs FROM segs GROUP BY 1),
doc_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_split
  FROM per_doc),
per_seq AS (
  SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs_in_seq
  FROM segs GROUP BY 1),
seq_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sequences,
         CAST(SUM(CASE WHEN n_docs_in_seq > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_seqs_with_boundary,
         ROUND(CAST(SUM(n_docs_in_seq) AS DOUBLE) / COUNT(*), 4)
             AS mean_docs_per_seq
  FROM per_seq)
SELECT n_docs, n_docs_split,
       ROUND(n_docs_split / CAST(n_docs AS DOUBLE), 6) AS doc_split_share,
       n_sequences, n_seqs_with_boundary, mean_docs_per_seq
FROM doc_stats CROSS JOIN seq_stats
"""

QUERIES["q_concat_boundary_stats"] = QuerySpec(
    q_concat_boundary_stats,
    Q_BOUNDARY_SQL,
    "concat-then-chunk boundary audit: split docs and multi-doc "
    "sequences — segment table from the distributed cumsum",
)


def q_attention_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-sequence attention pairs crossing a doc boundary:
    cross = (L^2 - sum seg_len^2) / 2 per sequence (L = seq fill),
    total = L (L - 1) / 2 within-sequence unordered pairs."""
    segs = _segments(spark, sf_dir)
    per_seq = segs.groupBy("seq_id").agg(
        F.sum("seg_len").cast("long").alias("fill"),
        F.sum(F.col("seg_len") * F.col("seg_len")).cast("long").alias("s2"),
    )
    agg = per_seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_sequences"),
        F.sum(
            ((F.col("fill") * F.col("fill") - F.col("s2")) / 2).cast(
                "decimal(38,0)"
            )
        ).alias("cross_pairs"),
        F.sum(
            (F.col("fill") * (F.col("fill") - 1) / 2).cast("decimal(38,0)")
        ).alias("total_pairs"),
    )
    return agg.select(
        "n_sequences",
        F.col("cross_pairs").cast("double").alias("cross_doc_pairs"),
        F.col("total_pairs").cast("double").alias("total_pairs"),
        F.round(
            F.col("cross_pairs").cast("double")
            / F.col("total_pairs").cast("double"),
            6,
        ).alias("contamination_share"),
    )


Q_ATTN_SQL = f"""
WITH {_TOK_SQL},
{_SEG_SQL},
per_seq AS (
  SELECT seq_id, CAST(SUM(seg_len) AS BIGINT) AS fill,
         CAST(SUM(seg_len * seg_len) AS BIGINT) AS s2
  FROM segs GROUP BY 1),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sequences,
         SUM(CAST((fill * fill - s2) / 2 AS DECIMAL(38,0))) AS cross_pairs,
         SUM(CAST(fill * (fill - 1) / 2 AS DECIMAL(38,0))) AS total_pairs
  FROM per_seq)
SELECT n_sequences,
       CAST(cross_pairs AS DOUBLE) AS cross_doc_pairs,
       CAST(total_pairs AS DOUBLE) AS total_pairs,
       ROUND(CAST(cross_pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE), 6)
           AS contamination_share
FROM agg
"""

QUERIES["q_attention_contamination"] = QuerySpec(
    q_attention_contamination,
    Q_ATTN_SQL,
    "cross-document attention share under concat-then-chunk — exact "
    "pair algebra per sequence, no materialization",
)

"""Text-analysis operators for training-data pipelines (SURVEY §2.3 J).

All operators are pure column expressions (JVM-side, codegen'd) — no
Python UDFs anywhere, so a 100 TB documents scan stays in whole-stage
codegen. Hashes are portable arithmetic (md5-hex → int) so the DuckDB
oracle can replicate them bit-for-bit.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT = "\\s+"
# BPE-ish token classes: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Tiny function-word lists per language for the n-gram/stopword
# language-ID heuristic. Order = deterministic tie-break order.
LANG_MARKERS = {
    "en": "(the|a|of|and|to|in|is|that|it|for)",
    "de": "(der|die|das|und|ist|nicht|mit|ein|zu|den)",
    "es": "(el|la|de|que|y|en|un|una|los|por)",
    "fr": "(le|la|les|de|et|un|une|est|pour|dans)",
    "zh": "(de|le|shi|bu|wo|you|zai|ta|men|zhe)",
}

MOD = 1_000_000_007


def words(text: str | Column) -> Column:
    """Whitespace tokens with empties dropped (leading/trailing
    whitespace yields empty strings from split on both engines).

    array_remove, not a filter() lambda: higher-order functions are
    CodegenFallback in Spark, so wrapping every tokenization in an
    interpreted filter() pushed the whole projection out of
    whole-stage codegen (measured +70% on q_fingerprints at sf0.1).
    array_remove is a plain codegen'd collection expression with the
    identical result — \\s+ splitting can only produce empty strings
    at the array edges, and array_remove drops them wherever they are.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(c, WORD_SPLIT), "")


def word_count(text: str | Column) -> Column:
    """Count of non-empty whitespace tokens = count of \\S+ runs — one
    codegen'd regex pass, no array materialization at all."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit("\\S+")).cast("long")


def token_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TOKEN_PATTERN)).cast("long")


def stopword_hits(text: str | Column, lang: str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(f"\\b{LANG_MARKERS[lang]}\\b")).cast("long")


def word_hash(word: Column) -> Column:
    """Portable 32-bit word hash: first 8 hex chars of md5 as int."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")


def fingerprint(text: str | Column) -> Column:
    """Order-sensitive rolling document fingerprint.

    fold over words: acc = (acc*31 + hash32(word)) mod 1e9+7 — the
    same value DuckDB computes with list_reduce, and stable across
    partitionings because it's evaluated per-row.
    """
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + word_hash(w)) % MOD,
    )


def quality_score(text: str | Column, n_chars: str | Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length, punctuation
    sparsity, stopword density. Integer counts → double arithmetic,
    identical on any engine."""
    c = F.col(text) if isinstance(text, str) else text
    nc = (F.col(n_chars) if isinstance(n_chars, str) else n_chars).cast("double")
    n_words = word_count(c).cast("double")
    len_score = F.least(nc / 400.0, F.lit(1.0))
    punct = F.regexp_count(c, F.lit("[^A-Za-z0-9\\s]")).cast("double")
    punct_penalty = F.least(punct / F.greatest(nc, F.lit(1.0)) * 5.0, F.lit(1.0))
    stop_density = F.least(
        stopword_hits(c, "en").cast("double") / F.greatest(n_words, F.lit(1.0)) * 4.0,
        F.lit(1.0),
    )
    return len_score * 0.5 + (1.0 - punct_penalty) * 0.2 + stop_density * 0.3


def blocked_fuzzy_pairs(
    df,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int,
    salt: int = 16,
):
    """Entity-resolution candidate pairs: blocking key + edit-distance
    verify — the classic record-linkage plan (all-pairs comparison is
    quadratic in the TABLE; blocked comparison is quadratic only in
    the BLOCK).

    Three things make this survive a skewed block key at scale (a
    low-cardinality key otherwise caps parallelism at #blocks and
    parks one straggler task on the hottest block — measured: one
    35-minute task on an 8-noun key at 200k rows):

    - **sub-bucket salting**: rows get a stable sub-bucket
      ``hash(id) % salt``; one join side is replicated across all
      ``salt`` sub-buckets and the other keeps its own, so the join
      key is (block, sub-bucket) — parallelism is blocks × salt and
      each pair is still formed exactly once (the replicated side
      meets the keyed side at the keyed row's bucket; id1 < id2
      orients the pair).
    - **length-band prefilter**: edit distance ≤ d implies length
      difference ≤ d, so ``|len(a) − len(b)| ≤ max_dist`` rides the
      join condition — candidates that cannot match are never scored.
    - **thresholded Levenshtein**: the verify uses the bounded
      algorithm (O(max_dist · min_len), early exit) — ``dist`` is the
      true distance when ≤ max_dist, else −1.

    Returns (id1, id2, blk, dist) for every length-banded intra-block
    pair (id1 < id2); callers count candidates (all rows) vs matches
    (dist ≥ 0) in one pass.
    """
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("nm"),
        block.alias("blk"),
        F.length(F.col(name_col)).alias("ln"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).alias("sb"),
    )
    x = b.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    # spread the keyed (probe) side across executors: a small dimension
    # file arrives as ONE input split, and with the replicated side
    # broadcast the whole quadratic probe would run in that single task
    # (measured: 52s single-core vs ~4s spread). The partition count is
    # EXPLICIT because AQE coalesces by bytes — this stage is tiny in
    # bytes but quadratic in CPU, the one shape byte-based coalescing
    # gets wrong. The shuffle carries the un-replicated side once.
    y = b.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col("blk"), F.col("sb")
    )
    return (
        x.alias("x")
        .join(
            y.alias("y"),
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.j") == F.col("y.sb"))
            & (F.col("x.id") < F.col("y.id"))
            & (F.abs(F.col("x.ln") - F.col("y.ln")) <= max_dist),
        )
        .select(
            F.col("x.id").alias("id1"),
            F.col("y.id").alias("id2"),
            F.col("x.blk").alias("blk"),
            F.levenshtein(F.col("x.nm"), F.col("y.nm"), max_dist).alias("dist"),
        )
    )


def bm25_scores(
    docs,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 relevance of every document against a fixed term set.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape (one documents scan): per-doc (dl, tf per query term) is
    a single projection — tf via regexp_count of the anchored term, so
    no explode of the corpus for a handful of query terms. The corpus
    stats (N, avgdl, df per term) aggregate that projection into ONE
    row which broadcasts back as a cross join — at 100 TB the scan is
    the only heavy stage and it reads each document exactly once.
    Returns (id, dl, score_raw) — callers round/rank.
    """
    import re as _re

    assert query_terms, "need at least one query term"
    # Terms are interpolated into regexp_count patterns on BOTH engines
    # (Spark and the DuckDB oracle); a metacharacter ('c++', 'a.b')
    # would silently mis-count or break the pattern, so restrict to
    # word characters rather than attempting two dialects of quoting.
    for t in query_terms:
        if not _re.fullmatch(r"[A-Za-z0-9_]+", t):
            raise ValueError(
                f"bm25 query term {t!r} must match [A-Za-z0-9_]+ "
                "(terms are embedded in regex patterns on both engines)"
            )
    tf_cols = [
        F.regexp_count(F.col(text_col), F.lit(f"\\b{t}\\b")).cast("double").alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ]
    per_doc = docs.select(
        F.col(id_col).alias("id"), word_count(text_col).cast("double").alias("dl"), *tf_cols
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    j = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            1.0 + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}")
        term = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        score = term if score is None else score + term
    return j.select("id", F.col("dl").cast("long").alias("dl"), score.alias("score_raw"))

"""Round-9 surface extensions, batch Q (SURVEY §2.3 N r9): three
training-data pipeline TRANSFORMS — the repeated-n-gram scrub (the
remediation for what q_gopher_repetition detects: exact interval-
union semantics via a bounded window, no per-doc UDF), the curation
funnel report (documents surviving each successive filter stage — the
pipeline's attrition ledger), and the training-shard manifest
(size-binned shards with per-doc byte offsets — the random-access
index a dataloader needs).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------- repeated-n-gram scrub (the remediation)
# Drop every token covered by a REPEATED 3-gram span (first
# occurrence kept): a position p is removed iff some duplicate-span
# START lies in [p−2, p]. That interval-union is exactly a bounded
# window max over is_dup_start — no per-doc Python, no interval
# merge. q_gopher_repetition MEASURES repetition; this returns the
# per-source before/after token ledger of actually scrubbing it.
# Scale: one explode, one (doc, gram) min-pos shuffle, one bounded
# window per doc — all linear in token count.


def q_repeated_ngram_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "w"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.withColumn(
        "g",
        F.when(
            F.lead("w", 2).over(wd).isNotNull(),
            F.concat_ws(" ", "w", F.lead("w", 1).over(wd), F.lead("w", 2).over(wd)),
        ),
    )
    first_pos = Window.partitionBy("doc_id", "g")
    flagged = grams.withColumn(
        "is_dup_start",
        (
            F.col("g").isNotNull()
            & (F.col("pos") > F.min("pos").over(first_pos))
        ).cast("int"),
    )
    covered = flagged.withColumn(
        "covered",
        F.max("is_dup_start").over(wd.rowsBetween(-2, 0)),
    )
    return (
        covered.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tokens_before"),
            F.sum(1 - F.col("covered")).cast("long").alias("tokens_after"),
            F.round(F.avg(F.col("covered").cast("double")), 6).alias("scrub_rate"),
        )
        .orderBy("source")
    )


Q_SCRUB_SQL = """
WITH toks AS (
  SELECT doc_id, source, w, pos - 1 AS pos
  FROM (SELECT doc_id, source,
               unnest(string_split(lower(text), ' ')) AS w,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents)),
grams AS (
  SELECT doc_id, source, pos,
         CASE WHEN LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
              THEN w || ' ' || LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                     || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
         END AS g
  FROM toks),
flagged AS (
  SELECT doc_id, source, pos,
         CASE WHEN g IS NOT NULL
               AND pos > MIN(pos) OVER (PARTITION BY doc_id, g) THEN 1
              ELSE 0 END AS is_dup_start
  FROM grams),
covered AS (
  SELECT source,
         MAX(is_dup_start) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS covered
  FROM flagged)
SELECT source, CAST(COUNT(*) AS BIGINT) AS tokens_before,
       CAST(SUM(1 - covered) AS BIGINT) AS tokens_after,
       ROUND(AVG(CAST(covered AS DOUBLE)), 6) AS scrub_rate
FROM covered
GROUP BY source
ORDER BY source
"""

QUERIES["q_repeated_ngram_scrub"] = QuerySpec(
    q_repeated_ngram_scrub,
    Q_SCRUB_SQL,
    "repeated-3-gram scrub: interval-union removal via one bounded "
    "window (remediation for q_gopher_repetition), per-source ledger",
)


# ------------------------------ curation funnel (attrition ledger)
# How many documents survive each successive filter stage — length
# floor → lang allowlist → repetition ceiling → quality floor. One
# scan computes every stage flag; the funnel is a 4-row unpivot of
# cumulative conjunctions (stage k = stages 1..k all pass), so a
# stage reordering shows up as a different ledger.


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.lower(F.col("text")).alias("t")
    )
    words = F.split(F.col("t"), " ")
    n_words = F.size(words)
    distinct_ratio = F.size(F.array_distinct(words)) / n_words
    flags = docs.select(
        (F.col("n_chars") >= 100).cast("int").alias("f1_len"),
        F.col("lang").isin("en", "de", "fr", "es").cast("int").alias("f2_lang"),
        (distinct_ratio >= 0.5).cast("int").alias("f3_rep"),
        (n_words >= 20).cast("int").alias("f4_quality"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("f1_len").alias("n1"),
        F.sum(F.col("f1_len") * F.col("f2_lang")).alias("n2"),
        F.sum(F.col("f1_len") * F.col("f2_lang") * F.col("f3_rep")).alias("n3"),
        F.sum(
            F.col("f1_len") * F.col("f2_lang") * F.col("f3_rep") * F.col("f4_quality")
        ).alias("n4"),
    )
    stages = [
        ("0_ingested", "n0"),
        ("1_len_floor", "n1"),
        ("2_lang_allow", "n2"),
        ("3_repetition", "n3"),
        ("4_quality", "n4"),
    ]
    out = None
    for label, c in stages:
        r = agg.select(
            F.lit(label).alias("stage"),
            F.col(c).cast("long").alias("n_docs"),
            F.round(F.col(c) / F.col("n0"), 6).alias("survival"),
        )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("stage")


Q_FUNNEL_SQL = """
WITH flags AS (
  SELECT CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS f1,
         CASE WHEN lang IN ('en', 'de', 'fr', 'es') THEN 1 ELSE 0 END AS f2,
         CASE WHEN len(list_distinct(string_split(lower(text), ' ')))
                   * 1.0 / len(string_split(lower(text), ' ')) >= 0.5
              THEN 1 ELSE 0 END AS f3,
         CASE WHEN len(string_split(lower(text), ' ')) >= 20 THEN 1 ELSE 0 END AS f4
  FROM documents),
agg AS (
  SELECT COUNT(*) AS n0, SUM(f1) AS n1, SUM(f1 * f2) AS n2,
         SUM(f1 * f2 * f3) AS n3, SUM(f1 * f2 * f3 * f4) AS n4
  FROM flags)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs, ROUND(n_docs * 1.0 / n0, 6) AS survival
FROM agg, (VALUES ('0_ingested'), ('1_len_floor'), ('2_lang_allow'),
                  ('3_repetition'), ('4_quality')) v(stage),
LATERAL (SELECT CASE v.stage WHEN '0_ingested' THEN n0 WHEN '1_len_floor' THEN n1
                 WHEN '2_lang_allow' THEN n2 WHEN '3_repetition' THEN n3
                 ELSE n4 END AS n_docs) x
ORDER BY stage
"""

QUERIES["q_curation_funnel"] = QuerySpec(
    q_curation_funnel,
    Q_FUNNEL_SQL,
    "curation funnel: documents surviving each successive filter "
    "stage (length, lang, repetition, quality) — the attrition ledger",
)


# ------------------------- training-shard manifest (byte offsets)
# Documents are size-binned into shards (running-sum packing per the
# compaction rule) and each doc gets its BYTE OFFSET within the shard
# — the manifest a dataloader uses for random access. Offsets are a
# per-shard prefix sum (n_chars + 1 separator); shard assignment is
# global running-sum over doc_id order, computed with the distributed
# prefix-sum machinery (_dist_cumsum, extensions_r8.py): range-
# repartition on doc_id, parallel per-partition running sums, one
# broadcast map of ≤32 partition offsets — no single-partition
# window anywhere on the corpus-sized path (the later offset window
# is keyed per shard). Output is the manifest HEAD (first 3 docs per
# shard) plus per-shard totals, keeping the result curve-sized.

_SHARD_BYTES = 50_000


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sized = _dist_cumsum(
        docs.withColumn("sz", F.col("n_chars") + 1),
        [F.col("doc_id")],
        "sz",
        out_col="cum_incl",
    ).withColumn("cum_before", F.col("cum_incl") - F.col("sz"))
    sharded = sized.withColumn("shard", F.floor(F.col("cum_before") / F.lit(_SHARD_BYTES)))
    ws = Window.partitionBy("shard").orderBy("doc_id")
    manifest = sharded.withColumn(
        "offset",
        F.coalesce(F.sum("sz").over(ws.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    ).withColumn("rn", F.row_number().over(ws))
    head = manifest.where(F.col("rn") <= 3).select(
        "shard", "doc_id", F.col("offset").cast("long").alias("offset")
    )
    totals = manifest.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("shard_bytes"),
    )
    return (
        head.join(totals, "shard")
        .select("shard", "doc_id", "offset", "n_docs", "shard_bytes")
        .orderBy("shard", "doc_id")
    )


Q_SHARD_SQL = f"""
WITH sized AS (
  SELECT doc_id, n_chars + 1 AS sz,
         COALESCE(SUM(n_chars + 1) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents),
sharded AS (
  SELECT doc_id, sz, CAST(FLOOR(cum_before / {_SHARD_BYTES}) AS BIGINT) AS shard
  FROM sized),
manifest AS (
  SELECT shard, doc_id, sz,
         COALESCE(SUM(sz) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM sharded),
totals AS (
  SELECT shard, COUNT(*) AS n_docs, SUM(sz) AS shard_bytes
  FROM manifest GROUP BY shard)
SELECT m.shard, m.doc_id, CAST(m.offset AS BIGINT) AS offset,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.shard_bytes AS BIGINT) AS shard_bytes
FROM manifest m JOIN totals t ON m.shard = t.shard
WHERE m.rn <= 3
ORDER BY m.shard, m.doc_id
"""

QUERIES["q_shard_manifest"] = QuerySpec(
    q_shard_manifest,
    Q_SHARD_SQL,
    "training-shard manifest: size-binned shards with per-doc byte "
    "offsets (running-sum packing + per-shard prefix sums)",
)

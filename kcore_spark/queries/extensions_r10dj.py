"""Round-10 surface extensions, batch DJ (SURVEY §2.3 N r10): the
LLM-serving-planning block, the inference-side sibling of
q_chinchilla_plan / q_padding_waste — KV-cache budgeting (sequences
that fit per GiB at pinned architecture constants, from the MEASURED
doc-length distribution: p50/p90/max-length sizing), the batch
latency-throughput tradeoff (fill-wait + service at batch sizes 1..64
under the measured event arrival rate — the knee every serving stack
tunes), and speculative-decoding gain (expected accepted run length
from the CORPUS bigram predictability as the acceptance-rate proxy —
E[accepted] = (1 - a^(k+1)) / (1 - a) per draft length k).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: lengths/rates are exact counts; architecture and cost
constants are pinned literals; the acceptance proxy is exact count
algebra over the bigram table.
Scale: doc lengths and bigrams fold from one scan each; planning
grids are k-row fan-outs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

# pinned 7B-ish architecture: 32 layers x 32 heads x 128 head-dim,
# 2 tensors (K+V), 2 bytes (fp16)
_KV_BYTES_PER_TOK = 32 * 32 * 128 * 2 * 2
_GIB = [8, 24, 80]
_BATCHES = [1, 4, 16, 64]
_MS_PER_TOK = 20.0  # pinned decode cost per token per batch (ms)
_DRAFTS = [2, 4, 8]


def q_kv_cache_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
        .cast("long")
        .alias("n_tok")
    )
    # exact p50/p90/max via the count-walk over the bounded length domain
    cc = docs.groupBy("n_tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    from pyspark.sql import Window

    w = Window.orderBy("n_tok").rowsBetween(Window.unboundedPreceding, 0)
    cum = cc.withColumn("cum", F.sum("c").over(w)).crossJoin(F.broadcast(tot))
    p50 = cum.where(F.col("cum") * 2 >= F.col("n")).agg(
        F.min("n_tok").alias("p50")
    )
    p90 = cum.where(F.col("cum") * 10 >= F.col("n") * 9).agg(
        F.min("n_tok").alias("p90")
    )
    mx = docs.agg(F.max("n_tok").alias("mx"))
    base = p50.crossJoin(F.broadcast(p90)).crossJoin(F.broadcast(mx))
    grid = F.explode(F.array(*[F.lit(g) for g in _GIB])).alias("gib")
    fan = base.select("p50", "p90", "mx", grid)
    bytes_avail = F.col("gib").cast("double") * 1073741824.0
    return fan.select(
        "gib",
        "p50",
        "p90",
        F.col("mx").alias("max_len"),
        F.floor(bytes_avail / (F.col("p50") * _KV_BYTES_PER_TOK))
        .cast("long")
        .alias("seqs_at_p50"),
        F.floor(bytes_avail / (F.col("p90") * _KV_BYTES_PER_TOK))
        .cast("long")
        .alias("seqs_at_p90"),
        F.floor(bytes_avail / (F.col("mx") * _KV_BYTES_PER_TOK))
        .cast("long")
        .alias("seqs_at_max"),
    ).orderBy("gib")


Q_KV_SQL = f"""
WITH dt AS (
  SELECT CAST(len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
              AS BIGINT) AS n_tok
  FROM documents),
cc AS (SELECT n_tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY n_tok),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dt),
cum AS (
  SELECT n_tok, SUM(c) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) AS cum, n
  FROM cc CROSS JOIN tot),
p50 AS (SELECT MIN(n_tok) AS p50 FROM cum WHERE cum * 2 >= n),
p90 AS (SELECT MIN(n_tok) AS p90 FROM cum WHERE cum * 10 >= n * 9),
mx AS (SELECT MAX(n_tok) AS mx FROM dt),
fan AS (
  SELECT p50, p90, mx, gib
  FROM p50 CROSS JOIN p90 CROSS JOIN mx
  CROSS JOIN (SELECT UNNEST([{", ".join(str(g) for g in _GIB)}]) AS gib) g)
SELECT gib, p50, p90, mx AS max_len,
       CAST(FLOOR(gib * 1073741824.0 / (p50 * {_KV_BYTES_PER_TOK}))
            AS BIGINT) AS seqs_at_p50,
       CAST(FLOOR(gib * 1073741824.0 / (p90 * {_KV_BYTES_PER_TOK}))
            AS BIGINT) AS seqs_at_p90,
       CAST(FLOOR(gib * 1073741824.0 / (mx * {_KV_BYTES_PER_TOK}))
            AS BIGINT) AS seqs_at_max
FROM fan ORDER BY gib
"""

QUERIES["q_kv_cache_budget"] = QuerySpec(
    q_kv_cache_budget,
    Q_KV_SQL,
    "KV-cache budget: concurrent sequences per GiB at measured "
    "p50/p90/max doc lengths — pinned fp16 7B constants",
)


def q_batch_latency_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean request latency at batch sizes 1/4/16/64: fill-wait
    (b-1)/(2*lambda) + service of the mean output length, vs the
    per-request throughput gain (pinned linear batching)."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    span = ev.agg(
        (
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / 1000.0
        ).alias("span_ks"),
        F.count(F.lit(1)).cast("long").alias("n_req"),
    )
    docs = load_table(spark, sf_dir, "documents").agg(
        F.round(
            F.sum(
                F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
                .cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_tok")
    )
    base = span.crossJoin(F.broadcast(docs))
    lam_per_s = F.col("n_req") / (F.col("span_ks") * 1000.0)
    grid = F.explode(F.array(*[F.lit(b) for b in _BATCHES])).alias("b")
    fan = base.select(lam_per_s.alias("lam"), "mean_tok", grid)
    fill_wait_ms = (F.col("b") - 1) / (2.0 * F.col("lam")) * 1000.0
    service_ms = F.col("mean_tok") * _MS_PER_TOK
    latency = fill_wait_ms + service_ms
    thru = F.col("b").cast("double") * 1000.0 / service_ms
    return fan.select(
        F.col("b").alias("batch_size"),
        F.round(F.col("lam"), 6).alias("arrival_per_s"),
        F.round(fill_wait_ms, 2).alias("fill_wait_ms"),
        F.round(latency, 2).alias("mean_latency_ms"),
        F.round(thru, 4).alias("requests_per_s"),
    ).orderBy("batch_size")


Q_BATCH_SQL = f"""
WITH span AS (
  SELECT (epoch(date_trunc('second', MAX(CAST(ts AS TIMESTAMP))))
          - epoch(date_trunc('second', MIN(CAST(ts AS TIMESTAMP))))) / 1000.0
             AS span_ks,
         CAST(COUNT(*) AS BIGINT) AS n_req
  FROM events),
docs AS (
  SELECT ROUND(CAST(SUM(CAST(len(list_filter(string_split(lower(text), ' '),
                w -> w <> '')) AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*), 4)
             AS mean_tok
  FROM documents),
fan AS (
  SELECT n_req / (span_ks * 1000.0) AS lam, mean_tok, b
  FROM span CROSS JOIN docs
  CROSS JOIN (SELECT UNNEST([{", ".join(str(b) for b in _BATCHES)}]) AS b) g)
SELECT b AS batch_size,
       ROUND(lam, 6) AS arrival_per_s,
       ROUND((b - 1) / (2.0 * lam) * 1000.0, 2) AS fill_wait_ms,
       ROUND((b - 1) / (2.0 * lam) * 1000.0 + mean_tok * {_MS_PER_TOK}, 2)
           AS mean_latency_ms,
       ROUND(CAST(b AS DOUBLE) * 1000.0 / (mean_tok * {_MS_PER_TOK}), 4)
           AS requests_per_s
FROM fan ORDER BY batch_size
"""

QUERIES["q_batch_latency_tradeoff"] = QuerySpec(
    q_batch_latency_tradeoff,
    Q_BATCH_SQL,
    "serving batch-size knee: fill-wait vs throughput at the measured "
    "arrival rate and mean output length",
)


def q_speculative_decode_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance proxy a = corpus share of tokens whose successor is
    the modal successor of that word (greedy bigram predictability);
    expected accepted tokens per draft of k = (1 - a^(k+1))/(1 - a)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w")
    ).where(F.col("w") != "")
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("nxt", F.lead("w").over(wd))
        .where(F.col("nxt").isNotNull())
        .groupBy("w", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_w = big.groupBy("w").agg(
        F.sum("c").cast("long").alias("tot"), F.max("c").cast("long").alias("modal")
    )
    a_row = per_w.agg(
        (
            F.sum("modal").cast("double") / F.sum("tot").cast("double")
        ).alias("accept_rate")
    )
    grid = F.explode(F.array(*[F.lit(k) for k in _DRAFTS])).alias("k")
    fan = a_row.select("accept_rate", grid)
    a = F.col("accept_rate")
    kd = F.col("k").cast("double")
    expected = (1.0 - F.pow(a, kd + 1.0)) / (1.0 - a)
    return fan.select(
        F.col("k").alias("draft_len"),
        F.round(a, 6).alias("accept_rate"),
        F.round(expected, 4).alias("expected_tokens_per_step"),
        F.round(expected / 1.0, 4).alias("speedup_vs_autoregressive"),
    ).orderBy("draft_len")


Q_SPEC_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos,
         unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
big AS (
  SELECT w, nxt, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT w, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM tok WHERE w <> '')
  WHERE nxt IS NOT NULL GROUP BY 1, 2),
per_w AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS tot, CAST(MAX(c) AS BIGINT) AS modal
  FROM big GROUP BY w),
a_row AS (
  SELECT CAST(SUM(modal) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE) AS accept_rate
  FROM per_w),
fan AS (
  SELECT accept_rate, k
  FROM a_row CROSS JOIN
    (SELECT UNNEST([{", ".join(str(k) for k in _DRAFTS)}]) AS k) g)
SELECT k AS draft_len,
       ROUND(accept_rate, 6) AS accept_rate,
       ROUND((1.0 - POWER(accept_rate, k + 1.0)) / (1.0 - accept_rate), 4)
           AS expected_tokens_per_step,
       ROUND((1.0 - POWER(accept_rate, k + 1.0)) / (1.0 - accept_rate), 4)
           AS speedup_vs_autoregressive
FROM fan ORDER BY draft_len
"""

QUERIES["q_speculative_decode_gain"] = QuerySpec(
    q_speculative_decode_gain,
    Q_SPEC_SQL,
    "speculative-decoding gain table from the measured greedy bigram "
    "acceptance rate — per-word modal-successor fold",
)

"""Python execution surface (SURVEY §2.3 K) + multimodal plumbing (J).

Demonstrates all five Python execution shapes — row udf, vectorized
pandas_udf, applyInPandas (grouped map), mapInPandas, and UDTF — each
under the oracle gate where the arithmetic is portable (integers).
These exist to prove the surface; the engine's own operators stay on
JVM expressions (UDFs are the slow path, per the project rules).

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from kcore_spark.caching import transient_persist
from kcore_spark.catalog import load_table
from kcore_spark.operators.multimodal import attach_payloads, extract_features
from kcore_spark.queries import QuerySpec

# -------------------------------------------------- vectorized pandas_udf


@F.pandas_udf(LongType())
def _vec_count(s: pd.Series) -> pd.Series:
    # Python re and RE2 agree on this class-only pattern.
    return s.str.count(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]").astype("int64")


def q_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", _vec_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("total_tokens"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


Q_PANDAS_UDF_SQL = """
SELECT source,
       CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
           AS total_tokens,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
"""

# -------------------------------------------------- grouped applyInPandas


def q_apply_in_pandas_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-gap stats via grouped-map pandas (integer secs)."""
    ev = load_table(spark, sf_dir, "events")

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # unit-safe epoch seconds (Arrow may hand back ns or µs)
        secs = pdf["ts"].astype("datetime64[s]").astype("int64")
        d = secs.diff().dropna().astype("int64")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "max_gap_s": [int(d.max()) if len(d) else 0],
                "min_gap_s": [int(d.min()) if len(d) else 0],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(gaps, "user_id long, n_events long, max_gap_s long, min_gap_s long")
        .orderBy("user_id")
    )


Q_APPLY_IN_PANDAS_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
           - LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id, COUNT(*) AS n_events,
       COALESCE(MAX(gap), 0) AS max_gap_s,
       COALESCE(MIN(gap), 0) AS min_gap_s
FROM g GROUP BY user_id
"""

# -------------------------------------------------- mapInPandas (multimodal)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column → mapInPandas feature extraction (decode
    stubbed; byte-level features are deterministic). Oracle computes
    the same features from the source text (fixture corpus is ASCII,
    so char codes == byte values)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payloads(docs)
    return extract_features(media).orderBy("doc_id")


Q_MULTIMODAL_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       CASE WHEN LENGTH(text) = 0 THEN -1 ELSE ascii(substring(text, 1, 1)) END AS first_byte,
       CASE WHEN LENGTH(text) = 0 THEN -1 ELSE ascii(substring(text, -1, 1)) END AS last_byte
FROM documents
"""

def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec decode under the oracle (operators/media.py): every
    17th document becomes a deterministic synthetic WAV (even doc_id:
    constant-amplitude PCM16) or PNG (odd doc_id: solid-color RGB,
    filter-0 scanlines), encoded executor-side with the stdlib
    encoders, then decoded back by ``media_features``'s RIFF/RFC-2083
    decoders in one Arrow-batched mapInPandas pass. Because the
    payloads derive arithmetically from doc_id, DuckDB can compute the
    expected decoded features (rate/samples/RMS, dims/pixel mean)
    without any codec — so a wrong chunk walk, scanline unfilter, or
    RMS scale breaks the value hash, not just a unit test.

    Constant-amplitude RMS and solid-color means are chosen to be
    IEEE-exact on both sides: sqrt(n*a^2/n)=a and integer channel
    means, so no rounding fuzz enters the hash. At 100 TB this is the
    same map-side embarrassingly-parallel shape as the stub pipeline —
    encode+decode ride one scan with no shuffle."""
    import pandas as pd

    from kcore_spark.operators.media import encode_png, encode_wav, media_features

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 17 == 0)
    )

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                if d % 2 == 0:
                    amp = 1000 + (d % 20) * 250
                    n = 160 + (d % 5) * 40
                    payloads.append(encode_wav([amp] * n, sample_rate=8000))
                else:
                    w, h = 8 + (d % 9), 4 + (d % 7)
                    r, g, b = d % 256, (7 * d) % 256, (13 * d) % 256
                    payloads.append(
                        encode_png(w, h, bytes([r, g, b]) * (w * h), color_type=2)
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    return media_features(media).select(
        "doc_id", "kind", "sample_rate", "n_samples", "rms",
        "width", "height", "mean_px",
    ).orderBy("doc_id")


Q_MEDIA_DECODE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'png' END AS kind,
       CASE WHEN doc_id % 2 = 0 THEN 8000 END AS sample_rate,
       CASE WHEN doc_id % 2 = 0 THEN 160 + (doc_id % 5) * 40 END AS n_samples,
       CASE WHEN doc_id % 2 = 0
            THEN (1000 + (doc_id % 20) * 250) / 32768.0 END AS rms,
       CASE WHEN doc_id % 2 = 1 THEN 8 + (doc_id % 9) END AS width,
       CASE WHEN doc_id % 2 = 1 THEN 4 + (doc_id % 7) END AS height,
       CASE WHEN doc_id % 2 = 1
            THEN ((doc_id % 256) + ((7 * doc_id) % 256) + ((13 * doc_id) % 256)) / 3.0
       END AS mean_px
FROM documents
WHERE doc_id % 17 = 0
ORDER BY doc_id
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: each payload yields 4 evenly-spaced
    16-byte frames via a 1→N mapInPandas expansion. The oracle slices
    the same windows relationally (ASCII corpus: byte offsets == char
    offsets), so the Arrow-batch expansion is hash-checked, not just
    smoke-tested."""
    from kcore_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_payloads(docs), n_frames=4, frame_bytes=16)
    return frames.select(
        "doc_id", "frame_idx", F.md5("frame").alias("frame_md5")
    ).orderBy("doc_id", "frame_idx")


Q_FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       md5(substring(text, (i * LENGTH(text)) // 4 + 1, 16)) AS frame_md5
FROM documents, UNNEST(generate_series(0, 3)) t(i)
WHERE LENGTH(text) > 0
"""


def q_multimodal_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality ROUTER: a mixed-modality corpus (magic-byte prefixes
    synthesized by doc_id % 3) is routed by sniffing the payload's
    leading bytes — never a metadata column, so routing survives
    mislabeled inputs — into the modality-specific Arrow extractor
    (byte features / frame sampling / windowed energy), then rolled up
    per modality. This is the dispatch layer a mixed 100 TB corpus
    needs in front of the per-modality decoders: one scan, three
    filtered mapInPandas branches, no shuffle before the final rollup.
    """
    from kcore_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        waveform_energy,
    )

    docs = load_table(spark, sf_dir, "documents")
    body = F.encode("text", "utf-8")
    mod = F.col("doc_id") % 3
    payload = (
        F.when(mod == 1, F.concat(F.lit(b"\x89PNG"), body))
        .when(mod == 2, F.concat(F.lit(b"RIFF"), body))
        .otherwise(body)
    )
    head = F.substring(F.col("payload"), 1, 4)
    media = transient_persist(  # three routed branches + the stats rollup read it
        docs.select("doc_id", payload.alias("payload"))
        .withColumn(
            "modality",
            F.when(head == F.lit(b"\x89PNG"), "image")
            .when(head == F.lit(b"RIFF"), "audio")
            .otherwise("text"),
        )
    )
    base_stats = media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("payload").cast("long")).alias("total_bytes"),
    )
    text_media = media.where(F.col("modality") == "text").withColumn(
        "media_type", F.lit("text/plain")
    )
    t_feat = extract_features(text_media).agg(
        F.sum("n_bytes").alias("routed_feature")
    ).withColumn("modality", F.lit("text"))
    i_feat = (
        frame_sample(media.where(F.col("modality") == "image"), n_frames=4, frame_bytes=16)
        .agg(F.count(F.lit(1)).cast("long").alias("routed_feature"))
        .withColumn("modality", F.lit("image"))
    )
    a_feat = (
        waveform_energy(media.where(F.col("modality") == "audio"), window=64)
        .agg(F.count(F.lit(1)).cast("long").alias("routed_feature"))
        .withColumn("modality", F.lit("audio"))
    )
    feats = t_feat.unionByName(i_feat).unionByName(a_feat)
    return (
        base_stats.join(feats, "modality")
        .select("modality", "n_docs", "total_bytes", "routed_feature")
        .orderBy("modality")
    )


Q_MULTIMODAL_ROUTER_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'text' END AS modality,
         octet_length(encode(text)) + CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 4 END AS nb
  FROM documents)
SELECT modality, COUNT(*) AS n_docs, CAST(SUM(nb) AS BIGINT) AS total_bytes,
       CAST(CASE modality
         WHEN 'text' THEN SUM(nb)
         WHEN 'image' THEN 4 * COUNT(*)
         ELSE SUM((nb + 63) // 64)
       END AS BIGINT) AS routed_feature
FROM m
GROUP BY modality
ORDER BY modality
"""


# -------------------------------------------------- row UDF (exists; slow path)


def q_row_udf_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time udf — included for surface completeness only."""
    bucket = F.udf(lambda v: int(v // 10) if v is not None else -1, LongType())
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(bucket("value").alias("value_bucket"))
        .groupBy("value_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("value_bucket")
    )


Q_ROW_UDF_SQL = """
SELECT CAST(floor(value / 10) AS BIGINT) AS value_bucket, COUNT(*) AS n
FROM events GROUP BY 1
"""

# -------------------------------------------------- Python UDTF


def q_udtf_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: per-row table expansion (top word lengths)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_len: long, n: long")
    class LenHist:
        def eval(self, text: str):
            from collections import Counter

            c = Counter(len(w) for w in text.split())
            for k in sorted(c):
                yield k, c[k]

    import uuid

    view = f"docs_udtf_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    spark.udtf.register("len_hist", LenHist)
    out = spark.sql(f"SELECT h.word_len, h.n FROM {view}, LATERAL len_hist(text) h")
    return out.groupBy("word_len").agg(F.sum("n").alias("n_words")).orderBy("word_len")


Q_UDTF_SQL = """
SELECT LENGTH(w) AS word_len, COUNT(*) AS n_words
FROM (SELECT UNNEST(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS w FROM documents)
GROUP BY 1
"""


QUERIES = {
    "q_pandas_udf_tokens": QuerySpec(q_pandas_udf_tokens, Q_PANDAS_UDF_SQL, "vectorized pandas_udf"),
    "q_apply_in_pandas_gaps": QuerySpec(
        q_apply_in_pandas_gaps, Q_APPLY_IN_PANDAS_SQL, "grouped-map applyInPandas"
    ),
    "q_frame_sample": QuerySpec(
        q_frame_sample, Q_FRAME_SAMPLE_SQL, "1-to-N frame sampling via mapInPandas"
    ),
    "q_multimodal_features": QuerySpec(
        q_multimodal_features, Q_MULTIMODAL_SQL, "mapInPandas binary decode plumbing"
    ),
    "q_multimodal_router": QuerySpec(
        q_multimodal_router, Q_MULTIMODAL_ROUTER_SQL, "magic-byte modality routing + per-type extract"
    ),
    "q_media_decode": QuerySpec(
        q_media_decode, Q_MEDIA_DECODE_SQL,
        "real WAV/PNG codec decode vs arithmetic oracle",
    ),
    "q_row_udf_bucket": QuerySpec(q_row_udf_bucket, Q_ROW_UDF_SQL, "row udf (surface only)"),
    "q_udtf_explode_words": QuerySpec(q_udtf_explode_words, Q_UDTF_SQL, "Python UDTF"),
}


def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed energy: 64-byte windows of each payload
    summed per window via mapInPandas (PCM stand-in); the oracle
    recomputes every window sum relationally over the ASCII corpus."""
    from kcore_spark.operators.multimodal import waveform_energy

    docs = load_table(spark, sf_dir, "documents")
    return (
        waveform_energy(attach_payloads(docs), window=64)
        .select("doc_id", "window_idx", "n_samples", "energy")
        .orderBy("doc_id", "window_idx")
    )


Q_AUDIO_ENERGY_SQL = """
SELECT doc_id, CAST(w AS INT) AS window_idx,
       CAST(LENGTH(substring(text, w*64+1, 64)) AS INT) AS n_samples,
       CAST(list_aggregate(list_transform(
              regexp_extract_all(substring(text, w*64+1, 64), '[\\s\\S]'),
              x -> ascii(x)), 'sum') AS BIGINT) AS energy
FROM documents, UNNEST(generate_series(0, (LENGTH(text) - 1) // 64)) t(w)
WHERE LENGTH(text) > 0
"""


QUERIES["q_audio_energy"] = QuerySpec(
    q_audio_energy, Q_AUDIO_ENERGY_SQL, "windowed waveform energy via mapInPandas"
)


# -------------------------------------------------- grouped-agg pandas UDF
# The fifth-and-a-half UDF kind: a vectorized AGGREGATE (one Arrow
# batch of group values in, one scalar out) — completes the surface
# next to scalar pandas_udf, applyInPandas, mapInPandas, row udf, UDTF.
# Determinism: the weighted sum runs in int64 (values are 2-decimal
# fixtures, ×100 is exact), so group order cannot perturb the result;
# only the final division is floating point, on identical operands.


@F.pandas_udf(DoubleType())
def _wavg_cents(v: pd.Series, w: pd.Series) -> float:
    num = int((v.mul(100).round().astype("int64") * w).sum())
    den = int(w.sum())
    return num / den / 100.0


# grouped-agg pandas UDFs cannot mix with non-pandas aggregates in one
# agg() (INVALID_PANDAS_UDF_PLACEMENT) — the row count is a second
# pandas aggregate for that reason, not a plain count()
@F.pandas_udf(LongType())
def _n_rows(v: pd.Series) -> int:
    return len(v)


def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weighted = ev.select(
        "event_type", "value", (F.col("user_id") % 10 + 1).alias("w")
    )
    return (
        weighted.groupBy("event_type")
        .agg(
            F.round(_wavg_cents("value", "w"), 6).alias("wavg_value"),
            _n_rows("value").alias("n"),
        )
        .orderBy("event_type")
    )


Q_PANDAS_GROUPED_AGG_SQL = """
SELECT event_type,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * (user_id % 10 + 1)) AS DOUBLE)
             / CAST(SUM(user_id % 10 + 1) AS DOUBLE) / 100.0, 6) AS wavg_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["q_pandas_udf_grouped_agg"] = QuerySpec(
    q_pandas_udf_grouped_agg, Q_PANDAS_GROUPED_AGG_SQL, "grouped-agg pandas UDF (Arrow)"
)


# -------------------------------------------------- mapInArrow


def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy end of the Python UDF matrix: batches
    arrive as raw pyarrow RecordBatches (no pandas conversion at all),
    the transform runs vectorized pyarrow compute kernels, and batches
    stream back. Here: per-document byte length and ASCII-ratio
    features over the raw text bytes — the shape a tokenizer-adjacent
    preprocessor uses when pandas object-dtype overhead matters. The
    oracle recomputes the same features in SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")

    def featurize(batches):
        for batch in batches:
            t = pa.table(
                {
                    "doc_id": batch.column(batch.schema.get_field_index("doc_id")),
                    "n_bytes": pc.binary_length(
                        pc.cast(
                            batch.column(batch.schema.get_field_index("text")),
                            pa.binary(),
                        )
                    ),
                    "n_chars": pc.utf8_length(
                        batch.column(batch.schema.get_field_index("text"))
                    ),
                    "source": batch.column(batch.schema.get_field_index("source")),
                }
            )
            yield from t.to_batches()

    feats = docs.mapInArrow(
        featurize, "doc_id long, n_bytes int, n_chars int, source string"
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_chars").alias("total_chars"),
            F.sum((F.col("n_bytes") > F.col("n_chars")).cast("long")).alias(
                "n_multibyte_docs"
            ),
        )
        .orderBy("source")
    )


Q_MAP_IN_ARROW_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN octet_length(encode(text)) > length(text) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multibyte_docs
FROM documents
GROUP BY source
ORDER BY source
"""

QUERIES["q_map_in_arrow"] = QuerySpec(
    q_map_in_arrow, Q_MAP_IN_ARROW_SQL, "mapInArrow zero-copy featurization"
)


# --------------------------------------- SQL-defined UDF + parameters


def q_sql_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-language UDFs (CREATE FUNCTION ... RETURN expr) and
    named-parameter queries (spark.sql(..., args={...})) — the SQL
    surface a warehouse user writes without touching Python. A scalar
    SQL UDF tiers order totals; the aggregation runs as a
    parameterized statement with the date cutoff bound server-side.
    SQL UDFs inline into the plan (no Python worker, full codegen) —
    the fast path for reusable business logic at any scale."""
    from kcore_spark.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_udf_orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_tier(p DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN p < 50000 THEN 'low' WHEN p < 150000 THEN 'mid' "
        "ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT order_tier(o_totalprice) AS tier,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM sql_udf_orders
        WHERE o_orderdate >= :cutoff
        GROUP BY tier
        ORDER BY tier
        """,
        args={"cutoff": "1996-01-01"},
    )


Q_SQL_UDF_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS tier,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY tier
ORDER BY tier
"""

QUERIES["q_sql_udf_surface"] = QuerySpec(
    q_sql_udf_surface,
    Q_SQL_UDF_SQL,
    "SQL-language UDF (CREATE FUNCTION ... RETURN) + named-parameter query",
)

"""Source coverage (SURVEY §2.3 A): CSV and JSON file sources with
schema inference, and in-memory tables via createDataFrame — each
round-tripped through a real file in a temp dir, then oracle-checked
against the original fixture content.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

_STAGED: dict[tuple[str, str], str] = {}


def _stage(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write a fixture out in fmt once per (sf_dir, fmt)."""
    key = (sf_dir, fmt)
    if key not in _STAGED:
        d = tempfile.mkdtemp(prefix=f"kcore_{fmt}_src_")
        if fmt == "csv":
            cust = load_table(spark, sf_dir, "customer")
            cust.coalesce(4).write.mode("overwrite").option("header", True).csv(
                os.path.join(d, "customer_csv")
            )
        elif fmt == "orc":
            li = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
            )
            li.coalesce(4).write.mode("overwrite").orc(os.path.join(d, "lineitem_orc"))
        elif fmt == "xml":
            nat = load_table(spark, sf_dir, "nation").select(
                "n_nationkey", "n_name", "n_regionkey"
            )
            nat.coalesce(1).write.mode("overwrite").format("xml").option(
                "rootTag", "nations"
            ).option("rowTag", "nation").save(os.path.join(d, "nation_xml"))
        elif fmt == "avro":
            # Spark 4.1's spark-sql jar ships the Avro FILE format
            # (org.apache.spark.sql.avro.AvroFileFormat, verified in
            # /opt/spark/jars/spark-sql_2.13-4.1.2.jar) but NOT the
            # spark-avro module's DataSourceRegister service entry, so
            # the "avro" short name fails while the fully-qualified
            # class works — the writes below produce REAL Avro
            # container files through the real avro-1.12.1 library.
            ords = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
            )
            ords.coalesce(4).write.mode("overwrite").format(
                "org.apache.spark.sql.avro.AvroFileFormat"
            ).save(os.path.join(d, "orders_avro"))
        elif fmt == "text":
            docs = load_table(spark, sf_dir, "documents").select(
                F.concat_ws(
                    "\t", F.col("doc_id"), F.col("lang"), F.col("source"), F.col("text")
                ).alias("value")
            )
            docs.coalesce(4).write.mode("overwrite").text(os.path.join(d, "docs_text"))
        elif fmt == "binary":
            # one real media FILE per sampled document, written
            # executor-side (foreachPartition, no driver collect) with
            # the q_media_decode parameterization so the oracle can
            # recompute every decoded feature arithmetically
            from kcore_spark.operators.media import encode_png, encode_wav

            out = os.path.join(d, "media_files")
            os.makedirs(out, exist_ok=True)
            docs = (
                load_table(spark, sf_dir, "documents")
                .select("doc_id")
                .where(F.col("doc_id") % 17 == 0)
            )

            def write_files(rows):
                for r in rows:
                    did = int(r["doc_id"])
                    if did % 2 == 0:
                        amp = 1000 + (did % 20) * 250
                        n = 160 + (did % 5) * 40
                        payload = encode_wav([amp] * n, sample_rate=8000)
                        name = f"doc_{did:07d}.wav"
                    else:
                        w, h = 8 + (did % 9), 4 + (did % 7)
                        rgb = bytes([did % 256, (7 * did) % 256, (13 * did) % 256])
                        payload = encode_png(w, h, rgb * (w * h), color_type=2)
                        name = f"doc_{did:07d}.png"
                    with open(os.path.join(out, name), "wb") as f:
                        f.write(payload)

            docs.foreachPartition(write_files)
        else:
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "event_type", "user_id", "value"
            )
            ev.coalesce(4).write.mode("overwrite").json(os.path.join(d, "events_json"))
        _STAGED[key] = d
    return _STAGED[key]


def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage(spark, sf_dir, "csv")
    cust = spark.read.option("header", True).option("inferSchema", True).csv(
        os.path.join(d, "customer_csv")
    )
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


Q_CSV_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
"""


def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage(spark, sf_dir, "json")
    ev = spark.read.json(os.path.join(d, "events_json"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_ids"),
            F.count_distinct("user_id").alias("users"),
        )
        .orderBy("event_type")
    )


Q_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids,
       COUNT(DISTINCT user_id) AS users
FROM events
GROUP BY event_type
"""


def q_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory dimension via createDataFrame, broadcast-joined."""
    dim = spark.createDataFrame(
        [
            ("BUILDING", "construction"),
            ("AUTOMOBILE", "vehicles"),
            ("MACHINERY", "industrial"),
            ("HOUSEHOLD", "consumer"),
            ("FURNITURE", "consumer"),
        ],
        "seg string, sector string",
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(dim), cust.c_mktsegment == dim.seg)
        .groupBy("sector")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("sector")
    )


Q_INLINE_DIM_SQL = """
SELECT sector, COUNT(*) AS n_customers
FROM customer
JOIN (VALUES ('BUILDING','construction'), ('AUTOMOBILE','vehicles'),
             ('MACHINERY','industrial'), ('HOUSEHOLD','consumer'),
             ('FURNITURE','consumer')) AS dim(seg, sector)
  ON c_mktsegment = seg
GROUP BY sector
"""


def q_avro_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro file source/sink roundtrip (SURVEY §1.2 schema-on-read
    row): orders written as real Avro container files (avro-1.12.1 via
    the in-jar AvroFileFormat — see _stage), read back through the
    same format class, aggregated. Decimal columns survive as Avro
    fixed/bytes logical types; the oracle recomputes from the original
    parquet. The from_avro/to_avro EXPRESSIONS (payload decode) are a
    separate module whose classes this container lacks — the pure-
    Python payload codec in operators/avro_codec.py covers that row.

    Scale: an Avro read is a plain file scan — splittable container
    blocks, per-file parallelism; the aggregation shuffles 1 row per
    (status) group after partial aggregation."""
    d = _stage(spark, sf_dir, "avro")
    ords = spark.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(
        os.path.join(d, "orders_avro")
    )
    return (
        ords.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("o_custkey").alias("custs"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)")).cast("double").alias(
                "total_price"
            ),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("o_orderstatus")
    )


Q_AVRO_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       COUNT(DISTINCT o_custkey) AS custs,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_avro_payload_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro-encoded message payloads, decoded (the from_avro row of
    SURVEY §1.2 — the container lacks the spark-avro expression
    classes, so the spec-pinned pure-Python binary codec in
    operators/avro_codec.py does the wire work; tests/test_avro_codec.py
    holds the golden bytes). Each event row is encoded as the Avro
    binary record (event_id long, event_type string,
    value union[null,double]) — the shape of a Kafka topic carrying
    Avro messages — then decoded back, and the DECODED columns are
    aggregated. SUM(LENGTH(payload)) is also surfaced and the oracle
    recomputes it arithmetically from the spec (zig-zag varint width +
    string length + union branch byte + 8-byte double), so a codec
    that produced wrong BYTES, not just wrong roundtrips, fails the
    hash.

    Scale: encode+decode ride one Arrow-batched mapInPandas pass —
    no shuffle until the final partial-aggregated groupBy."""
    import pandas as pd

    from kcore_spark.operators.avro_codec import decode_record, encode_record

    schema = [
        ("event_id", "long"),
        ("event_type", "string"),
        ("value", "null_or_double"),
    ]
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias(
            "value"
        ),
    )

    def roundtrip(batches):
        for pdf in batches:
            payloads = [
                encode_record(
                    (
                        int(i),
                        t,
                        None if v is None or v != v else float(v),
                    ),
                    schema,
                )
                for i, t, v in zip(pdf["event_id"], pdf["event_type"], pdf["value"])
            ]
            decoded = [decode_record(p, schema) for p in payloads]
            yield pd.DataFrame(
                {
                    "event_id": [d[0] for d in decoded],
                    "event_type": [d[1] for d in decoded],
                    "value": [d[2] for d in decoded],
                    "payload_len": [len(p) for p in payloads],
                }
            )

    dec = ev.mapInPandas(
        roundtrip, "event_id long, event_type string, value double, payload_len long"
    )
    return (
        dec.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_ids"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.sum("payload_len").alias("payload_bytes"),
        )
        .orderBy("event_type")
    )


# varint width of zigzag(event_id) (non-negative id → zigzag = 2*id);
# exact case thresholds, good to ids < 2^34 (fixture ids are far below)
Q_AVRO_PAYLOAD_SQL = """
WITH enc AS (
  SELECT event_type, event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
         (CASE WHEN 2*event_id < 128 THEN 1
               WHEN 2*event_id < 16384 THEN 2
               WHEN 2*event_id < 2097152 THEN 3
               WHEN 2*event_id < 268435456 THEN 4
               ELSE 5 END)
         + 1 + LENGTH(event_type)
         + 1 + CASE WHEN event_id % 7 = 0 THEN 0 ELSE 8 END AS plen
  FROM events)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(SUM(plen) AS BIGINT) AS payload_bytes
FROM enc
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "q_csv_source": QuerySpec(q_csv_source, Q_CSV_SQL, "CSV source + schema inference"),
    "q_json_source": QuerySpec(q_json_source, Q_JSON_SQL, "JSON-lines source"),
    "q_inline_dim_join": QuerySpec(q_inline_dim_join, Q_INLINE_DIM_SQL, "createDataFrame dim"),
    "q_avro_source": QuerySpec(
        q_avro_source, Q_AVRO_SQL, "Avro container-file source/sink (real avro-1.12.1)"
    ),
    "q_avro_payload_decode": QuerySpec(
        q_avro_payload_decode,
        Q_AVRO_PAYLOAD_SQL,
        "Avro binary payload encode/decode (spec-pinned codec; from_avro row)",
    ),
}


def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ORC source (columnar alternative to parquet): fixture
    round-tripped through ORC files, then aggregated — predicate/
    column pushdown applies to the ORC scan exactly as to parquet."""
    d = _stage(spark, sf_dir, "orc")
    li = spark.read.orc(os.path.join(d, "lineitem_orc"))
    return (
        li.where(F.col("l_quantity") < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)")).cast("double").alias("total"),
        )
        .orderBy("l_returnflag")
    )


Q_ORC_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS total
FROM lineitem
WHERE l_quantity < 10
GROUP BY l_returnflag
"""


QUERIES["q_orc_source"] = QuerySpec(q_orc_source, Q_ORC_SQL, "ORC source (native columnar)")


def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source (Spark 4 integrated the spark-xml reader):
    the nation table is staged as one XML document and read back with
    rowTag row discovery — the ingestion path for XML feeds (SURVEY
    block A; the reference declares no source formats at all). The
    aggregate rides the inferred schema."""
    d = _stage(spark, sf_dir, "xml")
    nat = spark.read.format("xml").option("rowTag", "nation").load(
        os.path.join(d, "nation_xml")
    )
    return (
        nat.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


Q_XML_SQL = """
SELECT n_regionkey, COUNT(*) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""

QUERIES["q_xml_source"] = QuerySpec(
    q_xml_source, Q_XML_SQL, "native XML source (Spark 4 built-in), rowTag read-back"
)


def q_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited text source: documents staged as TSV lines, read
    back with spark.read.text (one `value` column per line — the raw
    ingestion path for web-scale text dumps), parsed with split, and
    rolled up per (lang, source). The parse is JVM-side split/element_at
    riding the line scan; at 100 TB this is the classic pre-parquet
    landing-zone read."""
    d = _stage(spark, sf_dir, "text")
    lines = spark.read.text(os.path.join(d, "docs_text"))
    parts = F.split(F.col("value"), "\t", 4)
    parsed = lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("source"),
        parts.getItem(3).alias("text"),
    )
    return (
        parsed.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(F.length("text")).alias("chars"),
        )
        .orderBy("lang", "source")
    )


Q_TEXT_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""

QUERIES["q_text_source"] = QuerySpec(
    q_text_source, Q_TEXT_SQL, "line-delimited text source (spark.read.text + parse)"
)


def q_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source over a directory of REAL media files: every
    17th document is staged as a .wav or .png file (stdlib codecs,
    parameters derived from doc_id), listed and read back by Spark's
    binaryFile format (path/length/content columns), decoded by the
    RIFF/RFC-2083 decoders in one Arrow pass, and rolled up per kind.
    The oracle recomputes file counts and decoded unit totals (PCM
    samples / pixels) arithmetically from doc_id — a wrong file
    listing, content read, or decode breaks the value hash. Scale
    shape: binaryFile parallelizes by file; decode is map-side."""
    from kcore_spark.operators.media import media_features

    d = _stage(spark, sf_dir, "binary")
    files = spark.read.format("binaryFile").load(os.path.join(d, "media_files"))
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.", 1).cast("long").alias(
            "doc_id"
        ),
        F.col("content").alias("payload"),
    )
    feats = media_features(payloads)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(
                F.coalesce(
                    F.col("n_samples"), F.col("width") * F.col("height")
                ).cast("long")
            ).alias("total_units"),
        )
        .orderBy("kind")
    )


Q_BINARYFILE_SQL = """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'png' END AS kind,
       COUNT(*) AS n_files,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 160 + (doc_id % 5) * 40
                     ELSE (8 + (doc_id % 9)) * (4 + (doc_id % 7)) END) AS BIGINT)
         AS total_units
FROM documents
WHERE doc_id % 17 = 0
GROUP BY 1
ORDER BY kind
"""

QUERIES["q_binaryfile_source"] = QuerySpec(
    q_binaryfile_source,
    Q_BINARYFILE_SQL,
    "binaryFile source over real .wav/.png files + Arrow-batched decode rollup",
)

"""binaryFile source: the ingestion path for opaque media payloads
(SURVEY block J multimodal row) — whole files arrive as (path, length,
content BINARY) rows that the multimodal operators then route/decode."""

from __future__ import annotations


def test_binary_file_source_reads_whole_files(spark):
    from .conftest import SF_DIR

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(SF_DIR)
    )
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content"
    }
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 10  # the ten fixture tables
    for r in rows:
        assert r["length"] > 0 and len(r["content"]) == r["length"]
        # parquet magic bytes — content arrives intact, not truncated
        assert bytes(r["content"][:4]) == b"PAR1"


def test_binary_source_feeds_modality_sniff(spark):
    """The binary content column composes with the same magic-byte
    sniff the modality router uses (queries/udfs.py): routing runs on
    leading BYTES of whole-file payloads, never on metadata."""
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(SF_DIR)
    )
    head = F.substring(F.col("content"), 1, 4)
    routed = df.select(
        F.when(head == F.lit(b"\x89PNG"), "image")
        .when(head == F.lit(b"RIFF"), "audio")
        .otherwise("other")
        .alias("modality")
    )
    kinds = {r["modality"] for r in routed.collect()}
    # parquet is not a known media container -> falls through
    assert kinds == {"other"}

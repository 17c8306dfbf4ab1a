"""Round-10 surface extensions, batch BH (SURVEY §2.3 N r10): the
multimodal II block — a REAL BMP codec under the oracle
(operators/media.py::encode_bmp/decode_bmp, the third spec-pinned
container next to WAV and PNG: BITMAPFILEHEADER + BITMAPINFOHEADER,
bottom-up padded BGR rows), a container-size audit (the writer's
byte math — 44+2n for PCM16 WAV, 54+h·stride for BMP — proven
against octet_length), and a PNG luminance histogram over GRADIENT
images (bins depend on every decoded pixel, so a wrong scanline
walk breaks the hash, not just a unit test).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`);
codec layouts follow the public Windows BMP / RFC 2083 specs.
Determinism: payloads derive arithmetically from doc_id, so DuckDB
computes every expected feature closed-form with no codec.
Scale: encode+decode ride one Arrow-batched mapInPandas scan —
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _bmp_dims(d: int) -> tuple[int, int]:
    return 4 + d % 6, 3 + d % 5


def _bmp_rgb(d: int) -> tuple[int, int, int]:
    return d % 256, (11 * d) % 256, (17 * d) % 256


# -------------------------------------------------------- BMP decode


def q_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from kcore_spark.operators.media import decode_bmp, encode_bmp

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 23 == 0)
    )

    def gen(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                w, h = _bmp_dims(d)
                r, g, b = _bmp_rgb(d)
                payload = encode_bmp(w, h, bytes((r, g, b)) * (w * h))
                dec = decode_bmp(payload)
                rows.append(
                    {
                        "doc_id": d,
                        "width": dec["width"],
                        "height": dec["height"],
                        "mean_r": dec["mean_r"],
                        "mean_g": dec["mean_g"],
                        "mean_b": dec["mean_b"],
                        "mean_px": dec["mean_px"],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "doc_id long, width long, height long, mean_r double, "
        "mean_g double, mean_b double, mean_px double",
    ).orderBy("doc_id")


Q_BMP_SQL = """
SELECT doc_id,
       CAST(4 + doc_id % 6 AS BIGINT) AS width,
       CAST(3 + doc_id % 5 AS BIGINT) AS height,
       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
       CAST((11 * doc_id) % 256 AS DOUBLE) AS mean_g,
       CAST((17 * doc_id) % 256 AS DOUBLE) AS mean_b,
       ((doc_id % 256) + ((11 * doc_id) % 256) + ((17 * doc_id) % 256)) / 3.0
           AS mean_px
FROM documents
WHERE doc_id % 23 = 0
ORDER BY doc_id
"""

QUERIES["q_bmp_decode"] = QuerySpec(
    q_bmp_decode,
    Q_BMP_SQL,
    "real BMP encode+decode roundtrip under the oracle — bottom-up "
    "padded BGR rows, solid-color closed-form expectations",
)


# ------------------------------------------------ container size audit
# WAV PCM16 mono: 44 + 2n bytes. BMP 24-bit: 54 + h·(3w + pad).
# The query measures the ACTUAL encoded length; the oracle computes
# the spec formula — a hash match proves the writers' byte math.


def q_media_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from kcore_spark.operators.media import encode_bmp, encode_wav

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 23 == 0)
    )

    def gen(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                if d % 2 == 0:
                    n = 160 + (d % 5) * 40
                    size = len(encode_wav([500] * n, sample_rate=8000))
                    rows.append({"doc_id": d, "kind": "wav", "n_bytes": size})
                else:
                    w, h = _bmp_dims(d)
                    r, g, b = _bmp_rgb(d)
                    size = len(encode_bmp(w, h, bytes((r, g, b)) * (w * h)))
                    rows.append({"doc_id": d, "kind": "bmp", "n_bytes": size})
            yield pd.DataFrame(rows)

    sized = docs.mapInPandas(gen, "doc_id long, kind string, n_bytes long")
    return (
        sized.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("n_bytes").cast("long").alias("min_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("kind")
    )


Q_MEDIA_SIZE_SQL = """
WITH sized AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'bmp' END AS kind,
         CASE WHEN doc_id % 2 = 0
              THEN 44 + 2 * (160 + (doc_id % 5) * 40)
              ELSE 54 + (3 + doc_id % 5)
                   * (3 * (4 + doc_id % 6)
                      + (4 - (3 * (4 + doc_id % 6)) % 4) % 4)
         END AS n_bytes
  FROM documents WHERE doc_id % 23 = 0)
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
FROM sized
GROUP BY kind
ORDER BY kind
"""

QUERIES["q_media_size_audit"] = QuerySpec(
    q_media_size_audit,
    Q_MEDIA_SIZE_SQL,
    "container byte-size audit: measured WAV/BMP lengths vs the spec "
    "formulas — pins the writers' byte math via the hash",
)


# ----------------------------------------------- PNG luminance bins
# Grayscale gradient PNGs: pixel(x, y) = (d + x + y) % 256 over a
# w×h grid (filter-0 scanlines). 4 luminance bins of width 64 per
# image — every decoded pixel lands in the hash.


def q_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from kcore_spark.operators.media import decode_png, encode_png

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 29 == 0)
    )

    def gen(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                w, h = 6 + d % 7, 4 + d % 6
                px = bytes(((d + x + y) % 256) for y in range(h) for x in range(w))
                dec = decode_png(encode_png(w, h, px, color_type=0))
                bins = [0, 0, 0, 0]
                for v in dec["pixels"]:
                    bins[v // 64] += 1
                rows.append(
                    {
                        "doc_id": d,
                        "n_px": w * h,
                        "b0": bins[0],
                        "b1": bins[1],
                        "b2": bins[2],
                        "b3": bins[3],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen, "doc_id long, n_px long, b0 long, b1 long, b2 long, b3 long"
    ).orderBy("doc_id")


Q_IMG_HIST_SQL = """
WITH grid AS (
  SELECT doc_id,
         CAST(6 + doc_id % 7 AS BIGINT) AS w,
         CAST(4 + doc_id % 6 AS BIGINT) AS h
  FROM documents WHERE doc_id % 29 = 0),
px AS (
  SELECT doc_id, w, h, (doc_id + x.x + y.y) % 256 AS v
  FROM grid
  CROSS JOIN (SELECT UNNEST(range(0, 13)) AS x) x
  CROSS JOIN (SELECT UNNEST(range(0, 10)) AS y) y
  WHERE x.x < w AND y.y < h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
       CAST(SUM(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
       CAST(SUM(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
       CAST(SUM(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS b3
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["q_image_histogram"] = QuerySpec(
    q_image_histogram,
    Q_IMG_HIST_SQL,
    "PNG gradient-image luminance histogram under the oracle — every "
    "decoded pixel participates in the hash",
)

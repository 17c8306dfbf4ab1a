"""Round-10 surface extensions, batch DD (SURVEY §2.3 N r10): the
geo-encoding block — geohash (precision-5 base32: 13 lon bits and 12
lat bits interleaved, the standard cell key for spatial partitioning),
the geohash prefix-occupancy curve (cells and max occupancy at prefix
lengths 2/3/4 — how the partition key behaves as you coarsen), and the
Bing quadkey (level-8 base-4 tile path in Web-Mercator-free lat/lon
form, pinned). All three are CLOSED-FORM bit arithmetic — no UDF, no
loop: the quantized lon/lat integers are interleaved with literal
shift/mask expressions identical in both engines. Companion to
q_spatial_grid_join / q_hotspot_gi (ad-hoc grids) — these are the
standard keys.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: coordinates are the md5-uniform q_quadrat_test cloud;
quantization is floor arithmetic on doubles computed identically;
base32/base4 mapping is substring indexing on pinned alphabets.
Scale: pure expressions riding one scan; rollups are grid-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10bq import _POINTS_SQL, _points

QUERIES: dict[str, QuerySpec] = {}

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_LON_BITS = 13
_LAT_BITS = 12


def _geohash5(lat: Column, lon: Column) -> Column:
    """Precision-5 geohash via closed-form interleave of the quantized
    lon (13 bits) and lat (12 bits), MSB first, lon leads."""
    lonb = F.least(
        F.lit((1 << _LON_BITS) - 1),
        F.floor((lon + 180.0) / 360.0 * (1 << _LON_BITS)).cast("long"),
    )
    latb = F.least(
        F.lit((1 << _LAT_BITS) - 1),
        F.floor((lat + 90.0) / 180.0 * (1 << _LAT_BITS)).cast("long"),
    )
    inter = F.lit(0).cast("long")
    # 25 interleaved bits: positions 0,2,4,... from lon (MSB first),
    # 1,3,5,... from lat
    for i in range(25):
        if i % 2 == 0:  # lon bit (i // 2), MSB first
            src = F.shiftright(lonb, _LON_BITS - 1 - i // 2).bitwiseAND(F.lit(1))
        else:  # lat bit
            src = F.shiftright(latb, _LAT_BITS - 1 - i // 2).bitwiseAND(F.lit(1))
        inter = inter + F.shiftleft(src, 24 - i)
    chars = [
        F.substring(
            F.lit(_B32),
            (F.shiftright(inter, 25 - 5 * (g + 1)).bitwiseAND(F.lit(31)) + 1)
            .cast("int"),
            1,
        )
        for g in range(5)
    ]
    return F.concat(*chars)


def _geohash5_sql(lat: str, lon: str) -> str:
    lonb = (
        f"LEAST({(1 << _LON_BITS) - 1}, CAST(FLOOR(({lon} + 180.0) / 360.0"
        f" * {1 << _LON_BITS}) AS BIGINT))"
    )
    latb = (
        f"LEAST({(1 << _LAT_BITS) - 1}, CAST(FLOOR(({lat} + 90.0) / 180.0"
        f" * {1 << _LAT_BITS}) AS BIGINT))"
    )
    terms = []
    for i in range(25):
        if i % 2 == 0:
            src = f"(({lonb} >> {_LON_BITS - 1 - i // 2}) & 1)"
        else:
            src = f"(({latb} >> {_LAT_BITS - 1 - i // 2}) & 1)"
        terms.append(f"({src} << {24 - i})")
    inter = " + ".join(terms)
    chars = [
        f"substring('{_B32}', CAST(((({inter}) >> {25 - 5 * (g + 1)}) & 31) + 1"
        f" AS INT), 1)"
        for g in range(5)
    ]
    return " || ".join(chars)


def q_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    gh = pts.select(
        "c_custkey", _geohash5(F.col("lat"), F.col("lon")).alias("geohash")
    )
    top = (
        gh.groupBy("geohash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        .orderBy(F.col("n_points").desc(), "geohash")
        .limit(15)
    )
    return top


Q_GEOHASH_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
gh AS (SELECT c_custkey, {_geohash5_sql("lat", "lon")} AS geohash FROM pts)
SELECT geohash, CAST(COUNT(*) AS BIGINT) AS n_points
FROM gh GROUP BY geohash
ORDER BY n_points DESC, geohash LIMIT 15
"""

QUERIES["q_geohash_encode"] = QuerySpec(
    q_geohash_encode,
    Q_GEOHASH_SQL,
    "precision-5 geohash encode (closed-form 25-bit interleave, base32) "
    "— top occupied cells",
)


def q_geohash_prefix_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    gh = pts.select(_geohash5(F.col("lat"), F.col("lon")).alias("geohash"))
    arms = gh.select(
        F.explode(F.array(F.lit(2), F.lit(3), F.lit(4))).alias("plen"), "geohash"
    ).select("plen", F.expr("substring(geohash, 1, plen)").alias("p"))
    cells = arms.groupBy("plen", "p").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        cells.groupBy("plen")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.max("n").cast("long").alias("max_occupancy"),
            F.round(F.sum("n").cast("double") / F.count(F.lit(1)), 4).alias(
                "mean_occupancy"
            ),
        )
        .orderBy("plen")
    )


Q_PREFIX_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
gh AS (SELECT {_geohash5_sql("lat", "lon")} AS geohash FROM pts),
arms AS (
  SELECT plen, substring(geohash, 1, plen) AS p
  FROM gh CROSS JOIN (SELECT UNNEST([2, 3, 4]) AS plen) g),
cells AS (SELECT plen, p, CAST(COUNT(*) AS BIGINT) AS n FROM arms GROUP BY 1, 2)
SELECT plen, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(MAX(n) AS BIGINT) AS max_occupancy,
       ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 4) AS mean_occupancy
FROM cells GROUP BY plen ORDER BY plen
"""

QUERIES["q_geohash_prefix_curve"] = QuerySpec(
    q_geohash_prefix_curve,
    Q_PREFIX_SQL,
    "geohash prefix-occupancy curve at lengths 2/3/4 — partition-key "
    "coarsening behavior",
)


def q_quadkey_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-8 quadkey over plain lat/lon (equirectangular, pinned —
    no Mercator): tile = (floor x 2^8), digits = interleaved base-4."""
    pts = _points(spark, sf_dir)
    lvl = 8
    tx = F.least(
        F.lit((1 << lvl) - 1),
        F.floor((F.col("lon") + 180.0) / 360.0 * (1 << lvl)).cast("long"),
    )
    ty = F.least(
        F.lit((1 << lvl) - 1),
        F.floor((90.0 - F.col("lat")) / 180.0 * (1 << lvl)).cast("long"),
    )
    # digit per level: qx + 2*qy
    digits = [
        (
            F.shiftright(tx, lvl - 1 - i).bitwiseAND(F.lit(1))
            + F.shiftright(ty, lvl - 1 - i).bitwiseAND(F.lit(1)) * 2
        ).cast("int")
        for i in range(lvl)
    ]
    qk = F.concat(*[d.cast("string") for d in digits])
    enc = pts.select("c_custkey", qk.alias("quadkey"))
    return (
        enc.groupBy(F.substring("quadkey", 1, 4).alias("quadkey4"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        .orderBy(F.col("n_points").desc(), "quadkey4")
        .limit(15)
    )


def _qk_sql() -> str:
    lvl = 8
    tx = f"LEAST({(1 << lvl) - 1}, CAST(FLOOR((lon + 180.0) / 360.0 * {1 << lvl}) AS BIGINT))"
    ty = f"LEAST({(1 << lvl) - 1}, CAST(FLOOR((90.0 - lat) / 180.0 * {1 << lvl}) AS BIGINT))"
    digits = [
        f"CAST((({tx} >> {lvl - 1 - i}) & 1) + (({ty} >> {lvl - 1 - i}) & 1) * 2"
        f" AS VARCHAR)"
        for i in range(lvl)
    ]
    return " || ".join(digits)


Q_QUADKEY_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
enc AS (SELECT c_custkey, {_qk_sql()} AS quadkey FROM pts)
SELECT substring(quadkey, 1, 4) AS quadkey4,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM enc GROUP BY 1
ORDER BY n_points DESC, quadkey4 LIMIT 15
"""

QUERIES["q_quadkey_encode"] = QuerySpec(
    q_quadkey_encode,
    Q_QUADKEY_SQL,
    "level-8 quadkey encode (equirectangular, pinned) — level-4 tile "
    "rollup, closed-form base-4 interleave",
)

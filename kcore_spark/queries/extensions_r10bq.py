"""Round-10 surface extensions, batch BQ (SURVEY §2.3 N r10): the
spatial-statistics block over md5-pinned customer coordinates — the
quadrat test (variance-mean ratio of grid-cell counts: the
clustered/dispersed/random verdict), simplified Getis-Ord Gi*
hotspots (3×3-neighborhood z-scores over the cell grid, binary
weights — the "where are the hot cells" map as a table), and a
nearest-facility assignment (min haversine to a literal warehouse
set, averaged per nation — the logistics coverage read). Extends the
geo family around q_spatial_grid_join / q_haversine_nearest.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: md5-pinned coordinates; integer cell counts; the
neighborhood join is a 9-literal offset grid; haversine is the
token-identical great-circle formula.
Scale: one coordinate scan -> cell rollup (grid-sized table);
neighborhood join is grid×9; facility distances are a 5-literal
fan-out collapsed map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_NX, _NY = 12, 6  # lon x lat grid


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    def u(salt: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / 4294967296.0
        )

    return cust.select(
        "c_custkey",
        "c_nationkey",
        (u("lat") * 120.0 - 60.0).alias("lat"),
        (u("lon") * 360.0 - 180.0).alias("lon"),
    )


_POINTS_SQL = """
  SELECT c_custkey, c_nationkey,
         ('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8))::BIGINT
           / 4294967296.0 * 120.0 - 60.0 AS lat,
         ('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8))::BIGINT
           / 4294967296.0 * 360.0 - 180.0 AS lon
  FROM customer
"""


def _cells_expr():
    cx = F.least(F.lit(_NX - 1), F.floor((F.col("lon") + 180.0) / (360.0 / _NX)))
    cy = F.least(F.lit(_NY - 1), F.floor((F.col("lat") + 60.0) / (120.0 / _NY)))
    return cx.cast("long").alias("cx"), cy.cast("long").alias("cy")


_CELLS_SQL = f"""
  SELECT LEAST({_NX - 1}, CAST(FLOOR((lon + 180.0) / (360.0 / {_NX})) AS BIGINT)) AS cx,
         LEAST({_NY - 1}, CAST(FLOOR((lat + 60.0) / (120.0 / {_NY})) AS BIGINT)) AS cy,
         COUNT(*) AS cnt
  FROM ({_POINTS_SQL})
  GROUP BY 1, 2
"""


# ------------------------------------------------------ quadrat test
# VMR = s²/x̄ over the cell counts (empty cells count as zero via the
# full grid); chi² = (k−1)·VMR.


def q_quadrat_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cx, cy = _cells_expr()
    cells = pts.select(cx, cy).groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    k = _NX * _NY
    agg = cells.agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
        F.count(F.lit(1)).cast("long").alias("occupied"),
    )
    n = F.col("total").cast("double")
    mean = n / k
    # variance over ALL k cells (empties contribute 0): Σc² /k − mean²
    var = F.col("ss").cast("double") / k - mean * mean
    vmr = var / mean
    return agg.select(
        F.lit(k).cast("long").alias("n_cells"),
        "occupied",
        F.round(mean, 6).alias("mean_per_cell"),
        F.round(vmr, 6).alias("vmr"),
        F.round((k - 1) * vmr, 6).alias("chi2"),
    )


Q_QUADRAT_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
agg AS (
  SELECT SUM(cnt) AS total, SUM(cnt * cnt) AS ss,
         CAST(COUNT(*) AS BIGINT) AS occupied
  FROM cells)
SELECT CAST({_NX * _NY} AS BIGINT) AS n_cells, occupied,
       ROUND(CAST(total AS DOUBLE) / {_NX * _NY}, 6) AS mean_per_cell,
       ROUND((CAST(ss AS DOUBLE) / {_NX * _NY}
              - (CAST(total AS DOUBLE) / {_NX * _NY})
                * (CAST(total AS DOUBLE) / {_NX * _NY}))
             / (CAST(total AS DOUBLE) / {_NX * _NY}), 6) AS vmr,
       ROUND({_NX * _NY - 1} * (CAST(ss AS DOUBLE) / {_NX * _NY}
              - (CAST(total AS DOUBLE) / {_NX * _NY})
                * (CAST(total AS DOUBLE) / {_NX * _NY}))
             / (CAST(total AS DOUBLE) / {_NX * _NY}), 6) AS chi2
FROM agg
"""

QUERIES["q_quadrat_test"] = QuerySpec(
    q_quadrat_test,
    Q_QUADRAT_SQL,
    "quadrat variance-mean ratio over the coordinate grid — one cell "
    "rollup, empties counted via the fixed grid",
)


# ---------------------------------------------------- Gi* hotspots
# Simplified Gi* with binary 3×3 weights on OCCUPIED cells:
# z = (Σ_w c − m·x̄)/(s·√m); top-5 by z.


def q_hotspot_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cx, cy = _cells_expr()
    cells = pts.select(cx, cy).groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    k = _NX * _NY
    stats = cells.agg(
        F.sum("cnt").alias("total"), F.sum(F.col("cnt") * F.col("cnt")).alias("ss")
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    fan = cells.select(
        "cx", "cy", F.explode(offs).alias("o")
    ).select(
        (F.col("cx") + F.col("o.dx")).alias("nx"),
        (F.col("cy") + F.col("o.dy")).alias("ny"),
        F.col("cx").alias("ocx"),
        F.col("cy").alias("ocy"),
    )
    nb = fan.join(
        cells.select(
            F.col("cx").alias("ocx"), F.col("cy").alias("ocy"), F.col("cnt")
        ),
        ["ocx", "ocy"],
    ).where(
        (F.col("nx") >= 0) & (F.col("nx") < _NX) & (F.col("ny") >= 0) & (F.col("ny") < _NY)
    )
    hood = nb.groupBy(F.col("nx").alias("cx"), F.col("ny").alias("cy")).agg(
        F.sum("cnt").alias("wsum"), F.count(F.lit(1)).cast("long").alias("m")
    )
    j = hood.crossJoin(F.broadcast(stats))
    mean = F.col("total").cast("double") / k
    sd = F.sqrt(F.col("ss").cast("double") / k - mean * mean)
    z = (F.col("wsum").cast("double") - F.col("m").cast("double") * mean) / (
        sd * F.sqrt(F.col("m").cast("double"))
    )
    return (
        j.select("cx", "cy", "m", F.round(z, 6).alias("gi_z"))
        .orderBy(F.col("gi_z").desc(), "cx", "cy")
        .limit(5)
    )


Q_GI_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
stats AS (SELECT SUM(cnt) AS total, SUM(cnt * cnt) AS ss FROM cells),
offs AS (SELECT dx.dx, dy.dy
         FROM (SELECT UNNEST([-1, 0, 1]) AS dx) dx
         CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS dy) dy),
nb AS (
  SELECT cells.cx + dx AS cx, cells.cy + dy AS cy, cnt
  FROM cells CROSS JOIN offs
  WHERE cells.cx + dx >= 0 AND cells.cx + dx < {_NX}
    AND cells.cy + dy >= 0 AND cells.cy + dy < {_NY}),
hood AS (
  SELECT cx, cy, SUM(cnt) AS wsum, CAST(COUNT(*) AS BIGINT) AS m
  FROM nb GROUP BY cx, cy),
scored AS (
  SELECT cx, cy, m,
         ROUND((CAST(wsum AS DOUBLE) - CAST(m AS DOUBLE)
                * (CAST(total AS DOUBLE) / {_NX * _NY}))
               / (SQRT(CAST(ss AS DOUBLE) / {_NX * _NY}
                       - (CAST(total AS DOUBLE) / {_NX * _NY})
                         * (CAST(total AS DOUBLE) / {_NX * _NY}))
                  * SQRT(CAST(m AS DOUBLE))), 6) AS gi_z
  FROM hood CROSS JOIN stats)
SELECT cx, cy, m, gi_z
FROM scored
ORDER BY gi_z DESC, cx, cy
LIMIT 5
"""

QUERIES["q_hotspot_gi"] = QuerySpec(
    q_hotspot_gi,
    Q_GI_SQL,
    "simplified Getis-Ord Gi* hotspots over the coordinate grid — "
    "9-offset neighborhood join, top-5 z-scores",
)


# ------------------------------------------------- nearest facility
# Five literal warehouses; per customer the min haversine distance;
# per nation the average and the worst case.

_FACILITIES = [(40.0, -74.0), (51.5, 0.0), (35.7, 139.7), (-33.9, 151.2), (19.4, -99.1)]
_RAD = 0.017453292519943295


def q_nearest_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)

    def hav(flat: float, flon: float):
        dlat = (F.lit(flat) - F.col("lat")) * _RAD / 2.0
        dlon = (F.lit(flon) - F.col("lon")) * _RAD / 2.0
        h = (
            F.sin(dlat) * F.sin(dlat)
            + F.cos(F.col("lat") * _RAD)
            * F.cos(F.lit(flat) * _RAD)
            * F.sin(dlon)
            * F.sin(dlon)
        )
        return 2.0 * 6371.0 * F.asin(F.sqrt(h))

    nearest = F.least(*[hav(a, b) for a, b in _FACILITIES])
    per = pts.select("c_nationkey", F.round(nearest, 6).alias("km"))
    agg = per.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("km").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_km"),
        F.round(F.max("km"), 6).alias("max_km"),
    )
    return agg.orderBy("c_nationkey")


def _hav_sql(flat: float, flon: float) -> str:
    return (
        f"2.0 * 6371.0 * ASIN(SQRT("
        f"SIN(({flat} - lat) * {_RAD} / 2.0) * SIN(({flat} - lat) * {_RAD} / 2.0)"
        f" + COS(lat * {_RAD}) * COS({flat} * {_RAD})"
        f" * SIN(({flon} - lon) * {_RAD} / 2.0) * SIN(({flon} - lon) * {_RAD} / 2.0)))"
    )


Q_FACILITY_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
per AS (
  SELECT c_nationkey,
         ROUND(LEAST({", ".join(_hav_sql(a, b) for a, b in _FACILITIES)}), 6) AS km
  FROM pts)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(km AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
           AS avg_km,
       ROUND(MAX(km), 6) AS max_km
FROM per
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

QUERIES["q_nearest_facility"] = QuerySpec(
    q_nearest_facility,
    Q_FACILITY_SQL,
    "nearest-warehouse haversine distances per nation — 5-literal "
    "min, map-side, decimal-pinned averages",
)

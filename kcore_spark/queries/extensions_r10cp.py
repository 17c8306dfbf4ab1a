"""Round-10 surface extensions, batch CP (SURVEY §2.3 N r10): the
spatial-statistics block, second wave, over the same hashed customer
point cloud as q_quadrat_test / q_hotspot_gi — Moran's I (global
spatial autocorrelation of grid-cell counts under rook contiguity: is
clustering spatially STRUCTURED, where quadrat only says "clustered"),
Ripley's K at three radii (multi-scale clustering vs the CSR
expectation pi r^2 — naive, no edge correction, pinned), and the
Clark-Evans nearest-neighbor index (mean NN distance over the CSR
expectation 1/(2 sqrt(lambda)), with its normal z).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: coordinates are md5-uniform (the q_quadrat_test cloud);
pair distances are plain Euclidean doubles computed identically;
per-pair indicators are exact integers; NN picks tie-break by
neighbor key.
Scale: every pair stage is GRID-BLOCKED — points join only their
9-cell stencil (the q_hotspot_gi / q_lof_scores precedent), so pair
work scales with local density, never n^2; Moran's weight matrix is
the 72-cell rook adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10bq import (
    _NX,
    _NY,
    _POINTS_SQL,
    _cells_expr,
    _points,
)

QUERIES: dict[str, QuerySpec] = {}

_RADII = [5.0, 10.0, 20.0]
_AREA = 360.0 * 120.0


def _pts_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cx, cy = _cells_expr()
    return _points(spark, sf_dir).select("c_custkey", "lat", "lon", cx, cy)


_PTS_CELLS_SQL = f"""
  pts AS (
    SELECT c_custkey, lat, lon,
           LEAST({_NX - 1}, CAST(FLOOR((lon + 180.0) / (360.0 / {_NX}))
                 AS BIGINT)) AS cx,
           LEAST({_NY - 1}, CAST(FLOOR((lat + 60.0) / (120.0 / {_NY}))
                 AS BIGINT)) AS cy
    FROM ({_POINTS_SQL}))
"""


# ------------------------------------------------------------ Moran's I
# Values: grid-cell point counts (all 72 cells, zero-filled); weights:
# rook contiguity. I = (N/W) sum w_ij z_i z_j / sum z_i^2.


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts_cells(spark, sf_dir)
    counts = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("long").alias("v"))
    gx = spark.range(_NX).select(F.col("id").alias("cx"))
    gy = spark.range(_NY).select(F.col("id").alias("cy"))
    grid = gx.crossJoin(gy)
    cells = grid.join(counts, ["cx", "cy"], "left").select(
        "cx", "cy", F.coalesce("v", F.lit(0)).alias("v")
    )
    mean = cells.agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    z = cells.crossJoin(F.broadcast(mean)).select(
        "cx", "cy", "n_cells", (F.col("v").cast("double") - F.col("mu")).alias("z")
    )
    a = z.select("cx", "cy", "n_cells", F.col("z").alias("za"))
    b = z.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("z").alias("zb")
    )
    rook = a.join(
        F.broadcast(b),
        (F.abs(F.col("cx") - F.col("bx")) + F.abs(F.col("cy") - F.col("by"))) == 1,
    )
    num = rook.agg(
        F.first("n_cells").alias("n_cells"),
        F.count(F.lit(1)).cast("long").alias("w_sum"),
        F.sum(F.round(F.col("za") * F.col("zb"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("s_cross"),
    )
    den = z.agg(
        F.sum(F.round(F.col("z") * F.col("z"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("s_z2")
    )
    j = num.crossJoin(F.broadcast(den))
    nd = F.col("n_cells").cast("double")
    morans = (
        nd / F.col("w_sum").cast("double") * F.col("s_cross") / F.col("s_z2")
    )
    e_i = -1.0 / (nd - 1.0)
    return j.select(
        "n_cells",
        F.col("w_sum").alias("n_links"),
        F.round(morans, 6).alias("morans_i"),
        F.round(F.lit(e_i), 6).alias("expected_i"),
    )


Q_MORAN_SQL = f"""
WITH {_PTS_CELLS_SQL},
counts AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS v FROM pts GROUP BY 1, 2),
grid AS (
  SELECT gx.cx, gy.cy
  FROM (SELECT UNNEST(generate_series(0, {_NX - 1})) AS cx) gx
  CROSS JOIN (SELECT UNNEST(generate_series(0, {_NY - 1})) AS cy) gy),
cells AS (
  SELECT grid.cx, grid.cy, COALESCE(v, 0) AS v
  FROM grid LEFT JOIN counts ON grid.cx = counts.cx AND grid.cy = counts.cy),
mean_t AS (
  SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cells),
z AS (
  SELECT cx, cy, n_cells, CAST(v AS DOUBLE) - mu AS z
  FROM cells CROSS JOIN mean_t),
rook AS (
  SELECT a.n_cells, a.z AS za, b.z AS zb
  FROM z a JOIN z b
    ON ABS(a.cx - b.cx) + ABS(a.cy - b.cy) = 1),
num AS (
  SELECT MIN(n_cells) AS n_cells, CAST(COUNT(*) AS BIGINT) AS w_sum,
         CAST(SUM(CAST(ROUND(za * zb, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS s_cross
  FROM rook),
den AS (
  SELECT CAST(SUM(CAST(ROUND(z * z, 10) AS DECIMAL(38,10))) AS DOUBLE) AS s_z2
  FROM z)
SELECT n_cells, w_sum AS n_links,
       ROUND(CAST(n_cells AS DOUBLE) / w_sum * s_cross / s_z2, 6) AS morans_i,
       ROUND(-1.0 / (CAST(n_cells AS DOUBLE) - 1.0), 6) AS expected_i
FROM num CROSS JOIN den
"""

QUERIES["q_morans_i"] = QuerySpec(
    q_morans_i,
    Q_MORAN_SQL,
    "Moran's I of grid-cell counts under rook contiguity — 72-cell "
    "zero-filled grid, bounded adjacency join",
)


def _stencil_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct ordered point pairs within the 9-cell stencil, with
    Euclidean distance — the grid-blocked pair space."""
    pts = _pts_cells(spark, sf_dir)
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], ["dx", "dy"]
    )
    left = pts.crossJoin(F.broadcast(offs)).select(
        F.col("c_custkey").alias("ka"),
        F.col("lat").alias("la"),
        F.col("lon").alias("lo"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    right = pts.select(
        F.col("c_custkey").alias("kb"),
        F.col("lat").alias("lb"),
        F.col("lon").alias("lb_lon"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    return left.join(right, ["jx", "jy"]).where(F.col("ka") != F.col("kb")).select(
        "ka",
        "kb",
        F.sqrt(
            (F.col("la") - F.col("lb")) ** 2 + (F.col("lo") - F.col("lb_lon")) ** 2
        ).alias("dist"),
    )


_STENCIL_SQL = f"""
  offs AS (
    SELECT dx.dx, dy.dy
    FROM (SELECT UNNEST([-1, 0, 1]) AS dx) dx
    CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS dy) dy),
  pairs AS (
    SELECT a.c_custkey AS ka, b.c_custkey AS kb,
           SQRT(POWER(a.lat - b.lat, 2) + POWER(a.lon - b.lon, 2)) AS dist
    FROM pts a
    CROSS JOIN offs
    JOIN pts b ON a.cx + offs.dx = b.cx AND a.cy + offs.dy = b.cy
    WHERE a.c_custkey <> b.c_custkey)
"""


def q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _stencil_pairs(spark, sf_dir)
    n = _pts_cells(spark, sf_dir).count()
    grid = F.array(*[F.lit(r) for r in _RADII])
    fan = pairs.select("dist", F.explode(grid).alias("r"))
    per_r = fan.groupBy("r").agg(
        F.sum((F.col("dist") <= F.col("r")).cast("long")).alias("n_within")
    )
    k = F.col("n_within").cast("double") * _AREA / (float(n) * (float(n) - 1.0))
    csr = 3.141592653589793 * F.col("r") * F.col("r")
    return per_r.select(
        F.col("r").alias("radius"),
        "n_within",
        F.round(k, 4).alias("k_hat"),
        F.round(csr, 4).alias("k_csr"),
        F.round(k / csr, 6).alias("clustering_ratio"),
    ).orderBy("radius")


Q_RIPLEY_SQL = f"""
WITH {_PTS_CELLS_SQL},
{_STENCIL_SQL},
n_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
fan AS (
  SELECT dist, r
  FROM pairs CROSS JOIN
    (SELECT UNNEST([{", ".join(str(r) for r in _RADII)}]::DOUBLE[]) AS r) g),
per_r AS (
  SELECT r, CAST(SUM(CASE WHEN dist <= r THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within
  FROM fan GROUP BY r)
SELECT r AS radius, n_within,
       ROUND(n_within * {_AREA} / (CAST(n AS DOUBLE) * (n - 1.0)), 4) AS k_hat,
       ROUND(3.141592653589793 * r * r, 4) AS k_csr,
       ROUND((n_within * {_AREA} / (CAST(n AS DOUBLE) * (n - 1.0)))
             / (3.141592653589793 * r * r), 6) AS clustering_ratio
FROM per_r CROSS JOIN n_t ORDER BY radius
"""

QUERIES["q_ripley_k"] = QuerySpec(
    q_ripley_k,
    Q_RIPLEY_SQL,
    "Ripley's K at radii 5/10/20 vs the CSR pi r^2 — grid-blocked pair "
    "distances (9-cell stencil), no edge correction (pinned)",
)


def q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _stencil_pairs(spark, sf_dir)
    nn = pairs.groupBy("ka").agg(F.min("dist").alias("d_nn"))
    n = _pts_cells(spark, sf_dir).count()
    lam = float(n) / _AREA
    agg = nn.agg(
        F.count(F.lit(1)).cast("long").alias("n_with_nn"),
        F.sum(F.round("d_nn", 10).cast("decimal(38,10)")).cast("double").alias(
            "s_d"
        ),
    )
    mean_d = F.col("s_d") / F.col("n_with_nn").cast("double")
    expected = 0.5 / (lam**0.5)
    se = 0.26136 / ((float(n) * lam) ** 0.5)
    r_idx = mean_d / expected
    z = (mean_d - expected) / se
    return agg.select(
        F.col("n_with_nn").alias("n_points"),
        F.round(mean_d, 6).alias("mean_nn_dist"),
        F.round(F.lit(expected), 6).alias("expected_csr"),
        F.round(r_idx, 6).alias("clark_evans_r"),
        F.round(z, 6).alias("z_score"),
    )


Q_CLARK_SQL = f"""
WITH {_PTS_CELLS_SQL},
{_STENCIL_SQL},
nn AS (SELECT ka, MIN(dist) AS d_nn FROM pairs GROUP BY ka),
n_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_with_nn,
         CAST(SUM(CAST(ROUND(d_nn, 10) AS DECIMAL(38,10))) AS DOUBLE) AS s_d
  FROM nn)
SELECT n_with_nn AS n_points,
       ROUND(s_d / n_with_nn, 6) AS mean_nn_dist,
       ROUND(0.5 / SQRT(n / {_AREA}), 6) AS expected_csr,
       ROUND((s_d / n_with_nn) / (0.5 / SQRT(n / {_AREA})), 6)
           AS clark_evans_r,
       ROUND((s_d / n_with_nn - 0.5 / SQRT(n / {_AREA}))
             / (0.26136 / SQRT(n * (n / {_AREA}))), 6) AS z_score
FROM agg CROSS JOIN n_t
"""

QUERIES["q_clark_evans"] = QuerySpec(
    q_clark_evans,
    Q_CLARK_SQL,
    "Clark-Evans nearest-neighbor index + z — stencil-blocked NN "
    "distances against the CSR expectation",
)

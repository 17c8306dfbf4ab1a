"""Round-10 surface extensions, batch AZ (SURVEY §2.3 N r10): the
embedding-hygiene II block — split drift (centroid shift and norm
drift between two pinned halves of the corpus — the check run before
trusting a re-embedded corpus), the two-NN intrinsic-dimension
estimator (Facco et al.; label-blocked so the pair space stays
bounded), and an isotropy audit (anisotropy = energy of the mean
direction over mean energy — collapsed embeddings score near 1).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: md5-pinned halves; decimal-exact centroid/energy sums;
two-NN distances are per-pair doubles with pinned log sums.
Scale: drift/isotropy are posexplode partial-aggs (N×d -> d);
two-NN joins WITHIN labels only and takes the 2 smallest distances
per point via partitioned rank — never a global sort, never
all-pairs across blocks. The within-block join is quadratic in the
BLOCK size (exact by design, like the q_near_dup_jaccard family);
when blocks grow with the corpus, swap the candidate generator for
the IVF centroid shortlist (operators/similarity.py) — the estimator
itself only needs the 2 nearest, which the shortlist preserves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )


# -------------------------------------------------- embedding drift
# Halves by vec_id parity of md5; per-half decimal centroid and mean
# norm; drift = ||c1 − c2|| and the norm ratio.


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    half = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    ).alias("h")
    ex = emb.select(half, F.posexplode("e").alias("pos", "x"))
    cent = ex.groupBy("h", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cv")
    )
    shift = (
        cent.groupBy("pos")
        .pivot("h", [0, 1])
        .agg(F.first("cv"))
        .select(
            F.round((F.col("0") - F.col("1")) * (F.col("0") - F.col("1")), 12)
            .cast("decimal(28,12)")
            .alias("d2")
        )
        .agg(F.sqrt(F.sum("d2").cast("double")).alias("centroid_shift"))
    )
    norms = emb.select(
        half,
        F.sqrt(
            F.aggregate(F.col("e"), F.lit(0.0), lambda a, v: a + v * v)
        ).alias("nrm"),
    )
    nagg = norms.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.round(F.col("nrm"), 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_norm"),
    )
    a = nagg.where(F.col("h") == 0).select(
        F.col("n").alias("n0"), F.col("mean_norm").alias("m0")
    )
    b = nagg.where(F.col("h") == 1).select(
        F.col("n").alias("n1"), F.col("mean_norm").alias("m1")
    )
    return (
        shift.crossJoin(a)
        .crossJoin(b)
        .select(
            "n0",
            "n1",
            F.round("centroid_shift", 6).alias("centroid_shift"),
            F.round(F.col("m0") / F.col("m1"), 6).alias("norm_ratio"),
        )
    )


Q_EMB_DRIFT_SQL = """
WITH emb AS (
  SELECT vec_id,
         ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS h,
         embedding::DOUBLE[] AS e
  FROM embeddings),
ex AS (SELECT h, UNNEST(e) AS x, generate_subscripts(e, 1) AS pos FROM emb),
cent AS (
  SELECT h, pos,
         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
  FROM ex GROUP BY h, pos),
shift AS (
  SELECT SQRT(CAST(SUM(CAST(ROUND((a.cv - b.cv) * (a.cv - b.cv), 12)
                           AS DECIMAL(28,12))) AS DOUBLE)) AS centroid_shift
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.h = 0 AND b.h = 1),
norms AS (
  SELECT h, SQRT(list_reduce(list_prepend(0.0,
              list_transform(e, v -> v * v)), (x, y) -> x + y)) AS nrm
  FROM emb),
nagg AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(nrm, 9) AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
             AS mean_norm
  FROM norms GROUP BY h)
SELECT a.n AS n0, b.n AS n1,
       ROUND(centroid_shift, 6) AS centroid_shift,
       ROUND(a.mean_norm / b.mean_norm, 6) AS norm_ratio
FROM shift CROSS JOIN nagg a CROSS JOIN nagg b
WHERE a.h = 0 AND b.h = 1
"""

QUERIES["q_embedding_drift"] = QuerySpec(
    q_embedding_drift,
    Q_EMB_DRIFT_SQL,
    "split drift audit: centroid shift + norm ratio between pinned "
    "halves — posexplode partial-aggs, d-row pivot",
)


# --------------------------------------- two-NN intrinsic dimension
# Facco two-NN: per point, r1/r2 = 1st/2nd NN distance WITHIN its
# label block; d̂ = m / Σ ln(r2/r1).

# ≤16M float64 elements (~128 MB) per (chunk × n) distance buffer —
# the per-task memory bound for _block_nn's tiled pair walk
_NN_TILE_ELEMS = 16 << 20


def _block_nn(pdf):
    """Tiled exact two-NN walk over one label block (module-level so
    tests can drive the multi-chunk path directly)."""
    import numpy as np
    import pandas as pd

    X = np.array(pdf["e"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"vec_id": [], "r1": [], "r2": []}).astype(
            {"vec_id": "int64", "r1": "float64", "r2": "float64"}
        )
    r1 = np.empty(n)
    r2 = np.empty(n)
    # row-chunk the pair space: 3 (chunk × n) buffers live at peak —
    # bounded memory whatever the block size
    chunk = max(1, min(n, _NN_TILE_ELEMS // n))
    for s in range(0, n, chunk):
        t = min(s + chunk, n)
        acc = np.zeros((t - s, n))
        for d in range(X.shape[1]):
            diff = X[s:t, d][:, None] - X[:, d][None, :]
            acc += diff * diff
        D = np.sqrt(acc)
        D[np.arange(t - s), np.arange(s, t)] = np.inf  # vec_id != vid2
        if n >= 3:
            two = np.partition(D, 1, axis=1)
            r1[s:t] = two[:, 0]
            r2[s:t] = two[:, 1]
        else:
            # with a single candidate the old rn<=2 window yields
            # one row (r1 == r2, dropped by the r2 > r1 filter)
            r1[s:t] = D.min(axis=1)
            r2[s:t] = r1[s:t]
    return pd.DataFrame({"vec_id": ids, "r1": r1, "r2": r2})


def q_two_nn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 shape: the label-blocked pair space is walked with numpy
    inside one applyInPandas per label block (guide §4.2) instead of a
    Catalyst self-join + per-pair HOF fold + row_number window — the
    interpreted zip_with/aggregate over |block|² pairs dominated the
    old plan (4.8s → ~1s at sf0.1), and the window shuffled every
    pair. Bit-exactness: the distance accumulates DIMENSION-
    SEQUENTIALLY in float64 (acc += (a_d−b_d)² for d = 0..63), the
    exact addition order of both the old F.aggregate fold and the
    oracle's list_reduce, so sqrt/log land on identical doubles; r1/r2
    are the two smallest distance VALUES per row — the old
    (dist, vid2) window's rn<=2 picks exactly those (the vid2
    tie-break orders equal distances but cannot change which two
    values rank first), so np.partition reproduces them bit-for-bit.
    Per-point work is quadratic in the BLOCK (as before); blocks
    parallelize across tasks. r14: the distance matrix is TILED in row
    chunks sized to a fixed element budget, so peak memory per task is
    O(chunk × block) — bounded — instead of the r13 dense n×n (an 8 TB
    allocation at a 1M-row block; r13 VERDICT #2 / ADVICE #3). The
    final decimal sum is order-free, unchanged."""
    emb = _emb(spark, sf_dir)
    rr = (
        # NULL labels never join in the oracle's a.label = b.label (a
        # bare groupBy would give them their own block) — pin the join
        # semantics explicitly (r13 ADVICE #2; fixture labels are all
        # non-NULL, so the hash is unchanged)
        emb.where(F.col("label").isNotNull())
        .groupBy("label")
        .applyInPandas(_block_nn, "vec_id long, r1 double, r2 double")
        .where((F.col("r1") > 0) & (F.col("r2") > F.col("r1")))
    )
    agg = rr.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(
            F.round(F.log(F.col("r2") / F.col("r1")), 12).cast("decimal(28,12)")
        ).alias("s"),
    )
    return agg.select(
        "m",
        F.round(
            F.col("m").cast("double") / F.col("s").cast("double"), 6
        ).alias("intrinsic_dim"),
    )


Q_TWO_NN_SQL = """
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id,
         SQRT(list_reduce(list_prepend(0.0,
           list_transform(list_zip(a.e, b.e),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (x, y) -> x + y)) AS dist,
         b.vec_id AS vid2
  FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id <> b.vec_id),
nn AS (
  SELECT vec_id, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, vid2) AS rn
  FROM pairs),
rr AS (
  SELECT vec_id, MIN(dist) AS r1, MAX(dist) AS r2
  FROM nn WHERE rn <= 2 GROUP BY vec_id
  HAVING MIN(dist) > 0 AND MAX(dist) > MIN(dist)),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         SUM(CAST(ROUND(LN(r2 / r1), 12) AS DECIMAL(28,12))) AS s
  FROM rr)
SELECT m, ROUND(CAST(m AS DOUBLE) / CAST(s AS DOUBLE), 6) AS intrinsic_dim
FROM agg
"""

QUERIES["q_two_nn_intrinsic_dim"] = QuerySpec(
    q_two_nn_intrinsic_dim,
    Q_TWO_NN_SQL,
    "two-NN intrinsic-dimension estimate, label-blocked pair space — "
    "partitioned rank picks r1/r2, pinned log-ratio sum",
)


# --------------------------------------------------- isotropy audit
# anisotropy = ||μ||² / mean(||x||²) (0 = centered/isotropic-ish,
# -> 1 = all mass on one direction); plus the mean cosine to μ.


def q_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cent = (
        emb.select(F.posexplode("e").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda s: s["mu"]
            ).alias("mu")
        )
    )
    j = emb.crossJoin(F.broadcast(cent))
    dot = F.aggregate(
        F.zip_with(F.col("e"), F.col("mu"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm2 = F.aggregate(F.col("e"), F.lit(0.0), lambda a, v: a + v * v)
    mu2 = F.aggregate(F.col("mu"), F.lit(0.0), lambda a, v: a + v * v)
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first(mu2).alias("mu2"),
        F.sum(F.round(nrm2, 9).cast("decimal(28,9)")).cast("double").alias("se"),
        F.sum(
            F.round(dot / (F.sqrt(nrm2) * F.sqrt(mu2)), 12).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("sc"),
    )
    return agg.select(
        "n",
        F.round(
            F.col("mu2") / (F.col("se") / F.col("n").cast("double")), 6
        ).alias("anisotropy"),
        F.round(F.col("sc") / F.col("n").cast("double"), 6).alias(
            "mean_cosine_to_mean"
        ),
    )


Q_ISOTROPY_SQL = """
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent AS (
  SELECT array_agg(mu ORDER BY pos) AS mu
  FROM (
    SELECT pos, CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mu
    FROM (SELECT UNNEST(e) AS x, generate_subscripts(e, 1) AS pos FROM emb)
    GROUP BY pos)),
j AS (
  SELECT e,
         list_reduce(list_prepend(0.0,
           list_transform(list_zip(e, mu), p -> p[1] * p[2])),
           (x, y) -> x + y) AS dot,
         list_reduce(list_prepend(0.0, list_transform(e, v -> v * v)),
           (x, y) -> x + y) AS nrm2,
         list_reduce(list_prepend(0.0, list_transform(mu, v -> v * v)),
           (x, y) -> x + y) AS mu2
  FROM emb CROSS JOIN cent),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, ANY_VALUE(mu2) AS mu2,
         CAST(SUM(CAST(ROUND(nrm2, 9) AS DECIMAL(28,9))) AS DOUBLE) AS se,
         CAST(SUM(CAST(ROUND(dot / (SQRT(nrm2) * SQRT(mu2)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS sc
  FROM j)
SELECT n,
       ROUND(mu2 / (se / CAST(n AS DOUBLE)), 6) AS anisotropy,
       ROUND(sc / CAST(n AS DOUBLE), 6) AS mean_cosine_to_mean
FROM agg
"""

QUERIES["q_isotropy_audit"] = QuerySpec(
    q_isotropy_audit,
    Q_ISOTROPY_SQL,
    "isotropy audit: mean-direction energy share + mean cosine to "
    "the centroid — one posexplode pass, broadcast centroid",
)

"""Round-10 surface extensions, batch AF (SURVEY §2.3 N r10): the
clustering-validity block — the three indices every clustering eval
reports alongside silhouette (q_silhouette): Davies-Bouldin (scatter
vs separation, lower is better), Calinski-Harabasz (between/within
dispersion ratio, higher is better), and the Adjusted Rand Index
(pair-counting agreement between two labelings, chance-corrected).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal-exact centroid sums (the q_silhouette pairing),
array-order distance folds, integer pair counts; one ROUND at the end.
Scale: centroids are a posexplode partial-agg (N×d → k×d); every
cross is k×k or k-row broadcast; ARI is one groupBy contingency of
k1×k2 cells. Nothing is pairwise in N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )


def _centroids(emb: DataFrame) -> DataFrame:
    """Decimal-exact per-label centroids, ordered by dimension."""
    return (
        emb.select("label", F.posexplode("e").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
            ).alias("c"),
        )
    )


def _dist(a, b):
    """Euclidean distance between two same-length arrays, array-order fold."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# ------------------------------------------------ Davies-Bouldin
# s_i = mean member->centroid distance; R_ij = (s_i+s_j)/d(c_i,c_j);
# DB_i = max_{j != i} R_ij. Output one row per label plus its DB
# component; the index itself is AVG(db_i) and is recoverable from the
# rows. k centroids broadcast twice; the N-sized work is one
# member-to-own-centroid distance scan.


def q_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cent = _centroids(emb).persist()
    scatter = (
        emb.join(F.broadcast(cent), "label")
        .select("label", _dist(F.col("e"), F.col("c")).alias("d"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"), F.avg("d").alias("s"))
    )
    si = scatter.join(F.broadcast(cent), "label")
    pairs = si.alias("a").join(
        F.broadcast(si.select(F.col("label").alias("jlabel"), F.col("s").alias("sj"), F.col("c").alias("cj"))),
        F.col("label") != F.col("jlabel"),
    )
    return (
        pairs.select(
            "label",
            "n_vecs",
            F.col("s").alias("si"),
            ((F.col("s") + F.col("sj")) / _dist(F.col("c"), F.col("cj"))).alias("r"),
        )
        .groupBy("label")
        .agg(
            F.first("n_vecs").alias("n_vecs"),
            F.round(F.first("si"), 6).alias("scatter"),
            F.round(F.max("r"), 6).alias("db_component"),
        )
        .orderBy("label")
    )


Q_DAVIES_BOULDIN_SQL = """
WITH cent AS (
  SELECT label, array_agg(cv ORDER BY pos) AS c
  FROM (
    SELECT label, pos,
           CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
    FROM (SELECT label, UNNEST(embedding::DOUBLE[]) AS x,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos)
  GROUP BY label),
scatter AS (
  SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         AVG(SQRT(list_reduce(list_prepend(0.0,
           list_transform(list_zip(e.embedding::DOUBLE[], c.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (a, b) -> a + b))) AS s
  FROM embeddings e JOIN cent c ON e.label = c.label
  GROUP BY e.label),
si AS (SELECT scatter.label, n_vecs, s, c FROM scatter JOIN cent ON scatter.label = cent.label),
pairs AS (
  SELECT a.label, a.n_vecs, a.s AS si,
         (a.s + b.s) / SQRT(list_reduce(list_prepend(0.0,
           list_transform(list_zip(a.c, b.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (x, y) -> x + y)) AS r
  FROM si a JOIN si b ON a.label <> b.label)
SELECT label, n_vecs, ROUND(ANY_VALUE(si), 6) AS scatter,
       ROUND(MAX(r), 6) AS db_component
FROM pairs
GROUP BY label, n_vecs
ORDER BY label
"""

QUERIES["q_davies_bouldin"] = QuerySpec(
    q_davies_bouldin,
    Q_DAVIES_BOULDIN_SQL,
    "Davies-Bouldin components per label — decimal-exact centroids, "
    "k-row broadcast scatter/separation, no pairwise O(N²)",
)


# --------------------------------------------- Calinski-Harabasz
# CH = (B/(k-1)) / (W/(n-k)); B = sum_i n_i ||c_i - c||²,
# W = sum_x ||x - c_label||². One centroid pass, one global-mean
# k-row agg, one member-distance scan. Single-row output carries the
# pieces so the index is auditable.


def q_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cent = _centroids(emb)
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("ni"))
    ci = cent.join(sizes, "label")
    # global centroid = weighted mean of label centroids (exact: same sums)
    glob = (
        ci.select(F.posexplode("c").alias("pos", "cv"), "ni")
        .groupBy("pos")
        .agg((F.sum(F.col("cv") * F.col("ni")) / F.sum("ni")).alias("gv"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "gv"))), lambda s: s["gv"]
            ).alias("g")
        )
    )
    between = (
        ci.crossJoin(F.broadcast(glob))
        .select((F.col("ni") * F.pow(_dist(F.col("c"), F.col("g")), F.lit(2.0))).alias("b"))
        .agg(F.sum("b").alias("b"), F.count(F.lit(1)).cast("long").alias("k"))
    )
    within = (
        emb.join(F.broadcast(cent), "label")
        .select(F.pow(_dist(F.col("e"), F.col("c")), F.lit(2.0)).alias("w"))
        .agg(F.sum("w").alias("w"), F.count(F.lit(1)).cast("long").alias("n"))
    )
    return between.crossJoin(within).select(
        F.col("n"),
        F.col("k"),
        F.round("b", 6).alias("between_ss"),
        F.round("w", 6).alias("within_ss"),
        F.round(
            (F.col("b") / (F.col("k") - 1)) / (F.col("w") / (F.col("n") - F.col("k"))), 6
        ).alias("ch_index"),
    )


Q_CALINSKI_SQL = """
WITH cent AS (
  SELECT label, array_agg(cv ORDER BY pos) AS c
  FROM (
    SELECT label, pos,
           CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
    FROM (SELECT label, UNNEST(embedding::DOUBLE[]) AS x,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos)
  GROUP BY label),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS ni FROM embeddings GROUP BY label),
ci AS (SELECT cent.label, c, ni FROM cent JOIN sizes ON cent.label = sizes.label),
gmean AS (
  SELECT array_agg(gv ORDER BY pos) AS g
  FROM (
    SELECT pos, SUM(cv * ni) / SUM(ni) AS gv
    FROM (SELECT UNNEST(c) AS cv, generate_subscripts(c, 1) AS pos, ni FROM ci)
    GROUP BY pos)),
between_ss AS (
  SELECT SUM(ni * POWER(SQRT(list_reduce(list_prepend(0.0,
           list_transform(list_zip(c, g), p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (x, y) -> x + y)), 2.0)) AS b,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM ci CROSS JOIN gmean),
within_ss AS (
  SELECT SUM(POWER(SQRT(list_reduce(list_prepend(0.0,
           list_transform(list_zip(e.embedding::DOUBLE[], c.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (x, y) -> x + y)), 2.0)) AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings e JOIN cent c ON e.label = c.label)
SELECT n, k, ROUND(b, 6) AS between_ss, ROUND(w, 6) AS within_ss,
       ROUND((b / (k - 1)) / (w / (n - k)), 6) AS ch_index
FROM between_ss CROSS JOIN within_ss
"""

QUERIES["q_calinski_harabasz"] = QuerySpec(
    q_calinski_harabasz,
    Q_CALINSKI_SQL,
    "Calinski-Harabasz variance-ratio index — between/within SS from "
    "one centroid pass and one member scan",
)


# ------------------------------------------------ Adjusted Rand
# Agreement between the fixture's true label and a derived labeling
# (equal-width bucket of the first embedding component — data-driven
# and engine-portable, unlike hash()). ARI from the k1×k2 contingency
# table with C(n,2) pair counts; integer-exact until the final ratio.


def q_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", F.element_at("e", 1).alias("x0")
    )
    rng = emb.agg(F.min("x0").alias("lo"), F.max("x0").alias("hi"))
    lab2 = emb.crossJoin(F.broadcast(rng)).select(
        "label",
        F.least(
            F.lit(3),
            F.floor((F.col("x0") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 4.0)),
        )
        .cast("long")
        .alias("bucket"),
    )
    cells = lab2.groupBy("label", "bucket").agg(F.count(F.lit(1)).alias("nij"))
    c2 = lambda n: (n * (n - 1) / F.lit(2.0))  # noqa: E731
    sums = cells.agg(
        F.sum(c2(F.col("nij"))).alias("sum_ij"),
        F.sum("nij").cast("long").alias("n"),
        F.countDistinct("label").cast("long").alias("k1"),
        F.countDistinct("bucket").cast("long").alias("k2"),
    )
    a = cells.groupBy("label").agg(F.sum("nij").alias("ai")).agg(
        F.sum(c2(F.col("ai"))).alias("sum_a")
    )
    b = cells.groupBy("bucket").agg(F.sum("nij").alias("bj")).agg(
        F.sum(c2(F.col("bj"))).alias("sum_b")
    )
    exp = F.col("sum_a") * F.col("sum_b") / c2(F.col("n"))
    mx = (F.col("sum_a") + F.col("sum_b")) / 2.0
    return (
        sums.crossJoin(a)
        .crossJoin(b)
        .select(
            "n",
            "k1",
            "k2",
            F.round((F.col("sum_ij") - exp) / (mx - exp), 6).alias("ari"),
        )
    )


Q_ARI_SQL = """
WITH emb AS (
  SELECT label, embedding[1]::DOUBLE AS x0 FROM embeddings),
rng AS (SELECT MIN(x0) AS lo, MAX(x0) AS hi FROM emb),
lab2 AS (
  SELECT label,
         LEAST(3, CAST(FLOOR((x0 - lo) / ((hi - lo) / 4.0)) AS BIGINT)) AS bucket
  FROM emb CROSS JOIN rng),
cells AS (SELECT label, bucket, COUNT(*) AS nij FROM lab2 GROUP BY label, bucket),
sums AS (
  SELECT SUM(nij * (nij - 1) / 2.0) AS sum_ij, CAST(SUM(nij) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT label) AS BIGINT) AS k1,
         CAST(COUNT(DISTINCT bucket) AS BIGINT) AS k2
  FROM cells),
a AS (SELECT SUM(ai * (ai - 1) / 2.0) AS sum_a
      FROM (SELECT SUM(nij) AS ai FROM cells GROUP BY label)),
b AS (SELECT SUM(bj * (bj - 1) / 2.0) AS sum_b
      FROM (SELECT SUM(nij) AS bj FROM cells GROUP BY bucket))
SELECT n, k1, k2,
       ROUND((sum_ij - sum_a * sum_b / (n * (n - 1) / 2.0))
             / ((sum_a + sum_b) / 2.0 - sum_a * sum_b / (n * (n - 1) / 2.0)), 6) AS ari
FROM sums CROSS JOIN a CROSS JOIN b
"""

QUERIES["q_adjusted_rand"] = QuerySpec(
    q_adjusted_rand,
    Q_ARI_SQL,
    "Adjusted Rand Index between fixture labels and an equal-width "
    "bucket labeling — k1×k2 contingency, integer pair counts",
)

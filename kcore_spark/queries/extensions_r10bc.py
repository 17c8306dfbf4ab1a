"""Round-10 surface extensions, batch BC (SURVEY §2.3 N r10): the
pattern-detection block — a Fourier periodogram at named candidate
periods (explicit DFT sums over the daily series: the spectral
answer to "is there weekly seasonality?", next to q_acf_hourly /
q_seasonality_strength), Local Outlier Factor scores (k=3,
rank-pinned variant, label-blocked pair space — the density-based
anomaly detector next to q_mad_outliers' global one), and top event
trigrams (consecutive per-user event-type triples — the order-3
extension of q_next_event_pairs).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: day indexes from date arithmetic (no ranks); cos/sin
terms and reachability distances are pinned-decimal sums; LOF
neighbor sets are rank-pinned with vec_id tiebreaks (documented
variant: exactly 3 neighbors, not the within-k-dist closure).
Scale: DFT is one scan per 6-period fan-out collapsed map-side; LOF
joins stay WITHIN label blocks with partitioned ranks (quadratic in
the BLOCK size — swap in the IVF shortlist of operators/similarity.py
as the k-NN candidate generator when blocks grow with the corpus);
trigrams are two partitioned leads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_PERIODS = [3.5, 7.0, 14.0, 30.0, 91.0, 365.0]
_TWO_PI = 6.283185307179586


# ------------------------------------------------------- periodogram
# Daily order counts, centered; power(P) = (Σ y·cos(2πt/P))² +
# (Σ y·sin(2πt/P))², normalized by N².


def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    base = daily.agg(
        F.min("d").alias("d0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
    )
    j = daily.crossJoin(F.broadcast(base)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("double").alias("t"),
        (
            F.col("y").cast("double")
            - F.col("sy").cast("double") / F.col("n").cast("double")
        ).alias("yc"),
        "n",
    )
    grid = F.array(*[F.lit(p) for p in _PERIODS])
    fan = j.select("t", "yc", "n", F.explode(grid).alias("p"))
    w = _TWO_PI * F.col("t") / F.col("p")
    agg = fan.groupBy("p").agg(
        F.first("n").alias("n"),
        F.sum(
            F.round(F.col("yc") * F.cos(w), 9).cast("decimal(28,9)")
        ).alias("sc"),
        F.sum(
            F.round(F.col("yc") * F.sin(w), 9).cast("decimal(28,9)")
        ).alias("ss"),
    )
    power = (
        F.col("sc").cast("double") ** 2 + F.col("ss").cast("double") ** 2
    ) / (F.col("n").cast("double") ** 2)
    return agg.select(
        F.round("p", 1).alias("period_days"),
        F.round(power, 6).alias("power"),
    ).orderBy("period_days")


Q_PERIODOGRAM_SQL = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, COUNT(*) AS y
  FROM orders GROUP BY 1),
base AS (SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy
         FROM daily),
j AS (
  SELECT CAST(date_diff('day', d0, d) AS DOUBLE) AS t,
         CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS yc, n
  FROM daily CROSS JOIN base),
fan AS (
  SELECT t, yc, n, p
  FROM j CROSS JOIN (SELECT UNNEST([{", ".join(str(p) for p in _PERIODS)}]) AS p) g),
agg AS (
  SELECT p, ANY_VALUE(n) AS n,
         SUM(CAST(ROUND(yc * COS({_TWO_PI} * t / p), 9) AS DECIMAL(28,9))) AS sc,
         SUM(CAST(ROUND(yc * SIN({_TWO_PI} * t / p), 9) AS DECIMAL(28,9))) AS ss
  FROM fan GROUP BY p)
SELECT ROUND(p, 1) AS period_days,
       ROUND((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
              + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS power
FROM agg
ORDER BY period_days
"""

QUERIES["q_periodogram"] = QuerySpec(
    q_periodogram,
    Q_PERIODOGRAM_SQL,
    "DFT periodogram at 6 named periods over the centered daily "
    "series — map-side-collapsed fan-out, pinned cos/sin sums",
)


# ------------------------------------------------------- LOF scores
# Rank-pinned k=3 LOF within label blocks.


def q_lof_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    other = emb.select(
        F.col("label").alias("label2"),
        F.col("vec_id").alias("vid2"),
        F.col("e").alias("e2"),
    )
    pairs = emb.join(
        other,
        (F.col("label") == F.col("label2")) & (F.col("vec_id") != F.col("vid2")),
    ).select(
        "vec_id",
        "vid2",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("e"), F.col("e2"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "vid2")
    nn3 = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    kdist = nn3.groupBy("vec_id").agg(F.max("dist").alias("kd"))
    reach = nn3.join(
        kdist.select(F.col("vec_id").alias("vid2"), F.col("kd").alias("kd2")), "vid2"
    ).select(
        "vec_id",
        "vid2",
        F.greatest(F.col("kd2"), F.col("dist")).alias("reach"),
    )
    lrd = reach.groupBy("vec_id").agg(
        F.round(
            3.0
            / F.sum(F.round(F.col("reach"), 9).cast("decimal(28,9)")).cast("double"),
            9,
        ).alias("lrd")
    )
    lof = (
        nn3.join(
            lrd.select(F.col("vec_id").alias("vid2"), F.col("lrd").alias("lrd2")),
            "vid2",
        )
        .groupBy("vec_id")
        .agg(
            (
                F.sum(F.col("lrd2").cast("decimal(28,9)")).cast("double") / 3.0
            ).alias("mean_lrd2")
        )
        .join(lrd, "vec_id")
        .select(
            "vec_id",
            F.round(F.col("mean_lrd2") / F.col("lrd"), 6).alias("lof"),
        )
    )
    return lof.orderBy(F.col("lof").desc(), "vec_id").limit(10)


Q_LOF_SQL = """
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id, b.vec_id AS vid2,
         SQRT(list_reduce(list_prepend(0.0,
           list_transform(list_zip(a.e, b.e),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (x, y) -> x + y)) AS dist
  FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id <> b.vec_id),
nn3 AS (
  SELECT vec_id, vid2, dist
  FROM (SELECT vec_id, vid2, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, vid2) AS rn
        FROM pairs)
  WHERE rn <= 3),
kdist AS (SELECT vec_id, MAX(dist) AS kd FROM nn3 GROUP BY vec_id),
reach AS (
  SELECT nn3.vec_id, nn3.vid2, GREATEST(k2.kd, nn3.dist) AS reach
  FROM nn3 JOIN kdist k2 ON nn3.vid2 = k2.vec_id),
lrd AS (
  SELECT vec_id,
         ROUND(3.0 / CAST(SUM(CAST(ROUND(reach, 9) AS DECIMAL(28,9))) AS DOUBLE), 9)
             AS lrd
  FROM reach GROUP BY vec_id),
lof AS (
  SELECT nn3.vec_id,
         CAST(SUM(CAST(l2.lrd AS DECIMAL(28,9))) AS DOUBLE) / 3.0 AS mean_lrd2
  FROM nn3 JOIN lrd l2 ON nn3.vid2 = l2.vec_id
  GROUP BY nn3.vec_id)
SELECT lof.vec_id AS vec_id, ROUND(mean_lrd2 / lrd.lrd, 6) AS lof
FROM lof JOIN lrd ON lof.vec_id = lrd.vec_id
ORDER BY lof DESC, lof.vec_id
LIMIT 10
"""

QUERIES["q_lof_scores"] = QuerySpec(
    q_lof_scores,
    Q_LOF_SQL,
    "rank-pinned k=3 Local Outlier Factor within label blocks — "
    "partitioned NN ranks, pinned reachability sums, top-10",
)


# ---------------------------------------------- event trigram patterns
# Consecutive event-type triples per user; top 10 by count.


def q_event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .where(F.col("e3").isNotNull())
    )
    return (
        tri.groupBy(
            F.col("event_type").alias("step1"),
            F.col("e2").alias("step2"),
            F.col("e3").alias("step3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "step1", "step2", "step3")
        .limit(10)
    )


Q_EVENT_TRI_SQL = """
WITH tri AS (
  SELECT event_type AS step1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3
  FROM events)
SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
FROM tri
WHERE step3 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n DESC, step1, step2, step3
LIMIT 10
"""

QUERIES["q_event_trigram_patterns"] = QuerySpec(
    q_event_trigram_patterns,
    Q_EVENT_TRI_SQL,
    "top consecutive event-type trigrams per user — two partitioned "
    "leads, one grouped count",
)

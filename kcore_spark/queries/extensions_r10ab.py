"""Round-10 surface extensions, batch AB (SURVEY §2.3 N r10): the
evaluation-decomposition block — the Murphy decomposition of the
Brier score (reliability - resolution + uncertainty over score bins:
WHY a probabilistic model is miscalibrated, where q_brier_calibration
only says THAT it is) and top-k report stability between window
halves (is the "top parts" dashboard even reproducible).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the scorer is the pinned md5-uniform (the q_auc_roc
convention); bin moments are integer counts; decomposition terms are
rounded then decimal-summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_N_BINS = 10


# ----------------------- Murphy decomposition of the Brier score
# Score s = md5-uniform of the order key; outcome y = orderstatus F.
# Over 10 equal-width score bins: REL = E_bins[(s_bar - y_bar)^2],
# RES = E_bins[(y_bar - y_glob)^2], UNC = y_glob(1 - y_glob);
# Brier = REL - RES + UNC (verified in the output row). Integer bin
# counts; per-bin terms rounded then decimal-summed.


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("double")
                + 1
            )
            / F.lit(4294967296.0)
        ).alias("s"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    binned = orders.select(
        F.least(F.lit(_N_BINS - 1), F.floor(F.col("s") * _N_BINS)).alias("b"),
        "s",
        "y",
    )
    per = binned.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("s"), 12).cast("decimal(28,12)")).alias("ss"),
        F.sum("y").alias("sy"),
    )
    tot = per.agg(F.sum("n").alias("nn"), F.sum("sy").alias("yy"))
    j = per.crossJoin(F.broadcast(tot))
    sbar = F.col("ss").cast("double") / F.col("n")
    ybar = F.col("sy").cast("double") / F.col("n")
    yglob = F.col("yy").cast("double") / F.col("nn")
    rel_t = F.round(
        F.col("n") * (sbar - ybar) * (sbar - ybar), 12
    ).cast("decimal(28,12)")
    res_t = F.round(
        F.col("n") * (ybar - yglob) * (ybar - yglob), 12
    ).cast("decimal(28,12)")
    agg = j.agg(
        F.max("nn").alias("nn"),
        F.max("yy").alias("yy"),
        F.sum(rel_t).alias("srel"),
        F.sum(res_t).alias("sres"),
    )
    yg = F.col("yy").cast("double") / F.col("nn")
    rel = F.col("srel").cast("double") / F.col("nn")
    res = F.col("sres").cast("double") / F.col("nn")
    return agg.select(
        F.col("nn").cast("long").alias("n"),
        F.round(yg, 6).alias("base_rate"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(yg * (1 - yg), 6).alias("uncertainty"),
        F.round(rel - res + yg * (1 - yg), 6).alias("brier_recomposed"),
    )


Q_BRIERDEC_SQL = f"""
WITH src AS (
  SELECT (('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
          + 1.0) / 4294967296.0 AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders),
binned AS (
  SELECT LEAST({_N_BINS - 1}, CAST(FLOOR(s * {_N_BINS}) AS BIGINT)) AS b, s, y
  FROM src),
per AS (
  SELECT b, COUNT(*) AS n,
         SUM(CAST(ROUND(s, 12) AS DECIMAL(28,12))) AS ss,
         SUM(y) AS sy
  FROM binned GROUP BY b),
tot AS (SELECT SUM(n) AS nn, SUM(sy) AS yy FROM per),
terms AS (
  SELECT p.n, t.nn, t.yy,
         CAST(ROUND(p.n * POWER(CAST(p.ss AS DOUBLE) / p.n
                                - CAST(p.sy AS DOUBLE) / p.n, 2), 12)
              AS DECIMAL(28,12)) AS rel_t,
         CAST(ROUND(p.n * POWER(CAST(p.sy AS DOUBLE) / p.n
                                - CAST(t.yy AS DOUBLE) / t.nn, 2), 12)
              AS DECIMAL(28,12)) AS res_t
  FROM per p, tot t),
agg AS (
  SELECT MAX(nn) AS nn, MAX(yy) AS yy,
         SUM(rel_t) AS srel, SUM(res_t) AS sres
  FROM terms)
SELECT CAST(nn AS BIGINT) AS n,
       ROUND(CAST(yy AS DOUBLE) / nn, 6) AS base_rate,
       ROUND(CAST(srel AS DOUBLE) / nn, 6) AS reliability,
       ROUND(CAST(sres AS DOUBLE) / nn, 6) AS resolution,
       ROUND((CAST(yy AS DOUBLE) / nn) * (1 - CAST(yy AS DOUBLE) / nn), 6)
         AS uncertainty,
       ROUND(CAST(srel AS DOUBLE) / nn - CAST(sres AS DOUBLE) / nn
             + (CAST(yy AS DOUBLE) / nn) * (1 - CAST(yy AS DOUBLE) / nn), 6)
         AS brier_recomposed
FROM agg
"""

QUERIES["q_brier_decomposition"] = QuerySpec(
    q_brier_decomposition,
    Q_BRIERDEC_SQL,
    "Murphy decomposition of the Brier score over 10 score bins "
    "(reliability - resolution + uncertainty) — WHY miscalibrated",
)


# ------------------------------- top-k report stability (halves)
# Top-20 parts by revenue in each half of the order window; overlap
# (Jaccard) and the rank displacement of the survivors — is the
# leaderboard reproducible, or noise? Integer cents; the midpoint is
# the q_rfm_migration floor-pinned convention.

_TOPK = 20


def q_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").alias("d")
    )
    bounds = orders.agg(
        F.date_add(
            F.min("d"), F.floor(F.datediff(F.max("d"), F.min("d")) / 2).cast("int")
        ).alias("mid")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(bounds))
        .select(
            "l_partkey",
            "cents",
            (F.col("d") <= F.col("mid")).cast("int").alias("h1"),
        )
    )
    per = j.groupBy("l_partkey").agg(
        F.sum(F.col("cents") * F.col("h1")).alias("rev1"),
        F.sum(F.col("cents") * (1 - F.col("h1"))).alias("rev2"),
    )
    # each half's top-20 via orderBy().limit() — TakeOrderedAndProject,
    # the distributed top-k, NOT a global rank window over the
    # catalog-sized per-part rollup; ranks are then a 20-row window
    top1 = (
        per.orderBy(F.col("rev1").desc(), F.col("l_partkey"))
        .limit(_TOPK)
        .withColumn(
            "r1",
            F.row_number().over(Window.orderBy(F.col("rev1").desc(), F.col("l_partkey"))),
        )
        .select("l_partkey", "r1")
    )
    top2 = (
        per.orderBy(F.col("rev2").desc(), F.col("l_partkey"))
        .limit(_TOPK)
        .withColumn(
            "r2",
            F.row_number().over(Window.orderBy(F.col("rev2").desc(), F.col("l_partkey"))),
        )
        .select("l_partkey", "r2")
    )
    both = top1.join(top2, "l_partkey", "full")
    return both.agg(
        F.sum((F.col("r1").isNotNull() & F.col("r2").isNotNull()).cast("int"))
        .cast("long")
        .alias("n_common"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.round(
            F.sum((F.col("r1").isNotNull() & F.col("r2").isNotNull()).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("jaccard"),
        F.round(
            F.avg(
                F.when(
                    F.col("r1").isNotNull() & F.col("r2").isNotNull(),
                    F.abs(F.col("r1") - F.col("r2")).cast("double"),
                )
            ),
            4,
        ).alias("avg_rank_shift"),
    )


Q_TOPK_STAB_SQL = f"""
WITH bounds AS (
  SELECT MIN(o_orderdate)
           + CAST(FLOOR(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) / 2)
                  AS INTEGER) * INTERVAL 1 DAY AS mid
  FROM orders),
j AS (
  SELECT l.l_partkey,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CASE WHEN o.o_orderdate <= b.mid THEN 1 ELSE 0 END AS h1
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey, bounds b),
per AS (
  SELECT l_partkey, SUM(cents * h1) AS rev1, SUM(cents * (1 - h1)) AS rev2
  FROM j GROUP BY l_partkey),
top1 AS (
  SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY rev1 DESC, l_partkey) AS r1
  FROM per ORDER BY rev1 DESC, l_partkey LIMIT {_TOPK}),
top2 AS (
  SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY rev2 DESC, l_partkey) AS r2
  FROM per ORDER BY rev2 DESC, l_partkey LIMIT {_TOPK}),
merged AS (
  SELECT COALESCE(t1.l_partkey, t2.l_partkey) AS k, t1.r1, t2.r2
  FROM top1 t1 FULL JOIN top2 t2 ON t1.l_partkey = t2.l_partkey)
SELECT CAST(SUM(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_common,
       CAST(COUNT(*) AS BIGINT) AS n_union,
       ROUND(SUM(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS jaccard,
       ROUND(AVG(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
                      THEN CAST(ABS(r1 - r2) AS DOUBLE) END), 4)
         AS avg_rank_shift
FROM merged
"""

QUERIES["q_topk_stability"] = QuerySpec(
    q_topk_stability,
    Q_TOPK_STAB_SQL,
    "top-20 revenue leaderboard stability between window halves "
    "(Jaccard + rank displacement) — report reproducibility",
)

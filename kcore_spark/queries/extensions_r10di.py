"""Round-10 surface extensions, batch DI (SURVEY §2.3 N r10): the
access-locality block — cache-design analytics over part accesses.
Reuse distance (days since the SAME part was last ordered: the
inter-reference distribution that sizes caches, with P(reuse <=
7/30/90d)), hot-set stability (month-over-month Jaccard of the top-100
part set — does the working set drift?), and the cold-access rate
(share of each month's accesses touching never-before-seen parts —
the compulsory-miss curve). The temporal-locality evidence behind
q_encoding_advisor / q_compaction_plan / q_sort_key_advisor.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: distances are integer days from partitioned lags; top
sets fully tie-broken; first-seen months are exact mins.
Scale: reuse lags are PARTITIONED by part; hot sets are per-month
top-100 ranks (partitioned by month); cold rate is a first-seen join
— no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_HORIZONS = [7, 30, 90]
_TOPN = 100


def q_reuse_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("d"),
    )
    w = Window.partitionBy("l_partkey").orderBy("d", "l_orderkey", "l_linenumber")
    dist = (
        li.withColumn("prev_d", F.lag("d").over(w))
        .where(F.col("prev_d").isNotNull())
        .select(F.datediff("d", "prev_d").cast("long").alias("gap"))
    )
    agg = dist.agg(
        F.count(F.lit(1)).cast("long").alias("n_reuses"),
        F.round(
            F.sum(F.col("gap").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_gap_days"),
        *[
            F.round(
                F.sum((F.col("gap") <= h).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias(f"p_reuse_{h}d")
            for h in _HORIZONS
        ],
    )
    return agg


Q_REUSE_SQL = f"""
WITH dist AS (
  SELECT date_diff('day', prev_d, d) AS gap FROM (
    SELECT CAST(l_shipdate AS DATE) AS d,
           LAG(CAST(l_shipdate AS DATE)) OVER (
             PARTITION BY l_partkey
             ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber)
               AS prev_d
    FROM lineitem)
  WHERE prev_d IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_reuses,
       ROUND(CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*), 4)
           AS mean_gap_days,
       {", ".join(
           f"ROUND(SUM(CASE WHEN gap <= {h} THEN 1 ELSE 0 END)"
           f" / CAST(COUNT(*) AS DOUBLE), 6) AS p_reuse_{h}d"
           for h in _HORIZONS
       )}
FROM dist
"""

QUERIES["q_reuse_distance"] = QuerySpec(
    q_reuse_distance,
    Q_REUSE_SQL,
    "part reuse-distance distribution with P(reuse <= 7/30/90d) — "
    "part-partitioned lags, one fold",
)


def q_hot_set_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("m"),
    )
    per = li.groupBy("m", "l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("m").orderBy(F.col("n").desc(), F.col("l_partkey"))
    hot = per.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= _TOPN
    ).select("m", "l_partkey")
    nxt = hot.select((F.col("m") - 1).alias("m"), F.col("l_partkey").alias("pk2"))
    j = hot.join(
        nxt, (hot.m == nxt.m) & (hot.l_partkey == nxt.pk2), "left"
    ).groupBy(hot.m).agg(
        F.count(F.lit(1)).cast("long").alias("set_size"),
        F.sum(F.col("pk2").isNotNull().cast("long")).alias("n_shared"),
    )
    pair = j.select(
        "m",
        "set_size",
        "n_shared",
        F.round(
            F.col("n_shared")
            / (2 * F.col("set_size") - F.col("n_shared")).cast("double"),
            6,
        ).alias("jaccard_next_month"),
    )
    agg = pair.where(F.col("n_shared") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_month_pairs"),
        F.round(
            F.sum(F.round("jaccard_next_month", 6).cast("decimal(38,6)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_jaccard"),
        F.round(F.min("jaccard_next_month"), 6).alias("min_jaccard"),
        F.round(F.max("jaccard_next_month"), 6).alias("max_jaccard"),
    )
    return agg


Q_HOTSET_SQL = f"""
WITH per AS (
  SELECT CAST(YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS BIGINT) AS m,
         l_partkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2),
hot AS (
  SELECT m, l_partkey FROM (
    SELECT m, l_partkey,
           ROW_NUMBER() OVER (PARTITION BY m
                              ORDER BY n DESC, l_partkey) AS rk
    FROM per)
  WHERE rk <= {_TOPN}),
j AS (
  SELECT h.m, CAST(COUNT(*) AS BIGINT) AS set_size,
         CAST(SUM(CASE WHEN nx.pk2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared
  FROM hot h
  LEFT JOIN (SELECT m - 1 AS m, l_partkey AS pk2 FROM hot) nx
    ON h.m = nx.m AND h.l_partkey = nx.pk2
  GROUP BY h.m),
pair AS (
  SELECT m, set_size, n_shared,
         ROUND(n_shared / CAST(2 * set_size - n_shared AS DOUBLE), 6)
             AS jaccard_next_month
  FROM j)
SELECT CAST(COUNT(*) AS BIGINT) AS n_month_pairs,
       ROUND(CAST(SUM(CAST(ROUND(jaccard_next_month, 6) AS DECIMAL(38,6)))
             AS DOUBLE) / COUNT(*), 6) AS mean_jaccard,
       ROUND(MIN(jaccard_next_month), 6) AS min_jaccard,
       ROUND(MAX(jaccard_next_month), 6) AS max_jaccard
FROM pair WHERE n_shared > 0
"""

QUERIES["q_hot_set_stability"] = QuerySpec(
    q_hot_set_stability,
    Q_HOTSET_SQL,
    "month-over-month Jaccard of the top-100 hot part set — "
    "month-partitioned ranks, keyed self-join",
)


def q_cold_access_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("m"),
    )
    first = li.groupBy("l_partkey").agg(F.min("m").alias("m0"))
    j = li.join(first, "l_partkey").select(
        "m", (F.col("m") == F.col("m0")).cast("long").alias("cold")
    )
    per_m = j.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_accesses"),
        F.sum("cold").cast("long").alias("n_cold"),
    )
    # quarters of the observed window keep the output bounded and show
    # the compulsory-miss decay
    bounds = per_m.agg(F.min("m").alias("m_lo"), F.max("m").alias("m_hi"))
    q = per_m.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(3),
            F.floor(
                (F.col("m") - F.col("m_lo"))
                * 4
                / (F.col("m_hi") - F.col("m_lo") + 1)
            ).cast("int"),
        ).alias("quarter"),
        "n_accesses",
        "n_cold",
    )
    return (
        q.groupBy("quarter")
        .agg(
            F.sum("n_accesses").cast("long").alias("n_accesses"),
            F.sum("n_cold").cast("long").alias("n_cold"),
        )
        .select(
            "quarter",
            "n_accesses",
            "n_cold",
            F.round(
                F.col("n_cold") / F.col("n_accesses").cast("double"), 6
            ).alias("cold_rate"),
        )
        .orderBy("quarter")
    )


Q_COLD_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS BIGINT) AS m
  FROM lineitem),
first_m AS (SELECT l_partkey, MIN(m) AS m0 FROM li GROUP BY 1),
j AS (
  SELECT li.m, CASE WHEN li.m = m0 THEN 1 ELSE 0 END AS cold
  FROM li JOIN first_m ON li.l_partkey = first_m.l_partkey),
per_m AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_accesses,
         CAST(SUM(cold) AS BIGINT) AS n_cold
  FROM j GROUP BY m),
bounds AS (SELECT MIN(m) AS m_lo, MAX(m) AS m_hi FROM per_m),
q AS (
  SELECT LEAST(3, CAST(FLOOR((m - m_lo) * 4.0 / (m_hi - m_lo + 1)) AS INT))
             AS quarter,
         n_accesses, n_cold
  FROM per_m CROSS JOIN bounds)
SELECT quarter,
       CAST(SUM(n_accesses) AS BIGINT) AS n_accesses,
       CAST(SUM(n_cold) AS BIGINT) AS n_cold,
       ROUND(SUM(n_cold) / CAST(SUM(n_accesses) AS DOUBLE), 6) AS cold_rate
FROM q GROUP BY quarter ORDER BY quarter
"""

QUERIES["q_cold_access_rate"] = QuerySpec(
    q_cold_access_rate,
    Q_COLD_SQL,
    "compulsory-miss curve: share of never-before-seen parts per "
    "window quarter — first-seen join, monthly fold",
)

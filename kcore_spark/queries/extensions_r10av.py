"""Round-10 surface extensions, batch AV (SURVEY §2.3 N r10): the
sequential/rank-test block — the Page-Hinkley drift detector (running
cumulative deviation minus its running minimum; the online companion
to q_cusum_changepoint), the Friedman test applied to weekday
seasonality (rank-within-week blocks — the nonparametric sibling of
q_weekday_effect), and Yuen's trimmed-mean t-test (the robust
two-sample location test next to q_welch_ttest / q_mann_whitney).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer daily counts and average ranks (tie blocks get
the same average rank in both engines: MIN-rank + (ties−1)/2);
trimmed/winsorized aggregates cut at exact percentiles; decimal-
pinned sums throughout.
Scale: Page-Hinkley walks the calendar-bounded daily series
(adjudicated global windows); Friedman ranks are PARTITIONED per
week; Yuen is two filtered moment aggs after a 2-row percentile
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ---------------------------------------------------- Page-Hinkley
# Daily mean event value x_t; m_t = Σ (x_i − x̄ − δ); PH_t = m_t −
# min_{i≤t} m_i; alarm at the first day PH_t > λ (δ=0.005, λ=0.5).


def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        (
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("x")
    )
    xbar = daily.agg(
        (F.sum(F.round(F.col("x"), 9).cast("decimal(28,9)")).cast("double")
         / F.count(F.lit(1))).alias("xbar")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = F.round(F.col("x") - F.col("xbar") - 0.005, 9)
    walked = (
        daily.crossJoin(F.broadcast(xbar))
        .withColumn("m", F.sum(dev.cast("decimal(28,9)")).over(w).cast("double"))
        .withColumn("mmin", F.min("m").over(w))
        .withColumn("ph", F.col("m") - F.col("mmin"))
    )
    alarm = walked.where(F.col("ph") > 0.5).agg(
        F.min(F.unix_timestamp("d")).alias("alarm_epoch")
    )
    peak = walked.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max("ph"), 6).alias("max_ph"),
    )
    return peak.crossJoin(alarm).select(
        "n_days", "max_ph", F.col("alarm_epoch").cast("long").alias("alarm_epoch")
    )


Q_PH_SQL = """
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS x
  FROM events GROUP BY 1),
xbar AS (
  SELECT CAST(SUM(CAST(ROUND(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
         AS xbar FROM daily),
walked AS (
  SELECT d,
         CAST(SUM(CAST(ROUND(x - xbar - 0.005, 9) AS DECIMAL(28,9)))
              OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS m
  FROM daily CROSS JOIN xbar),
ph AS (
  SELECT d, m - MIN(m) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS ph
  FROM walked),
alarm AS (SELECT CAST(MIN(epoch(d)) AS BIGINT) AS alarm_epoch
          FROM ph WHERE ph > 0.5),
peak AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                ROUND(MAX(ph), 6) AS max_ph FROM ph)
SELECT n_days, max_ph, alarm_epoch
FROM peak CROSS JOIN alarm
"""

QUERIES["q_page_hinkley"] = QuerySpec(
    q_page_hinkley,
    Q_PH_SQL,
    "Page-Hinkley drift detector on the daily value series — pinned "
    "cumulative deviations, running minimum, first-alarm day",
)


# ------------------------------------------- Friedman weekday test
# Blocks = complete ISO weeks of daily order counts; treatments =
# 7 weekdays; average ranks within each week; χ²_F = 12/(nk(k+1))
# Σ R_j² − 3n(k+1).


def q_friedman_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events, not orders: the event stream covers every calendar day
    # even at the sparsest fixture scale, so complete weeks exist
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    keyed = daily.select(
        F.weekofyear("d").alias("wk"),
        F.year("d").alias("yr"),
        F.dayofweek("d").alias("dow"),
        "y",
    )
    full = keyed.groupBy("yr", "wk").agg(F.count(F.lit(1)).alias("c")).where(
        F.col("c") == 7
    )
    blocks = keyed.join(full.select("yr", "wk"), ["yr", "wk"])
    wr = Window.partitionBy("yr", "wk").orderBy("y")
    ties = Window.partitionBy("yr", "wk", "y")
    ranked = blocks.withColumn(
        "r",
        F.rank().over(wr).cast("double")
        + (F.count(F.lit(1)).over(ties).cast("double") - 1) / 2.0,
    )
    rj = ranked.groupBy("dow").agg(
        F.sum(F.round(F.col("r"), 1).cast("decimal(18,1)")).alias("rsum")
    )
    nb = blocks.select("yr", "wk").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks")
    )
    agg = rj.crossJoin(F.broadcast(nb)).agg(
        F.first("n_blocks").alias("n_blocks"),
        F.sum(
            F.col("rsum").cast("double") * F.col("rsum").cast("double")
        ).alias("sr2"),
    )
    n = F.col("n_blocks").cast("double")
    stat = 12.0 / (n * 7.0 * 8.0) * F.col("sr2") - 3.0 * n * 8.0
    return agg.select(
        "n_blocks",
        F.round("sr2", 2).alias("sum_rank_sq"),
        F.round(stat, 6).alias("friedman_chi2"),
    )


Q_FRIEDMAN_SQL = """
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, COUNT(*) AS y
  FROM events GROUP BY 1),
keyed AS (
  SELECT weekofyear(d) AS wk, year(d) AS yr, dayofweek(d) + 1 AS dow, y
  FROM daily),
full_weeks AS (
  SELECT yr, wk FROM keyed GROUP BY yr, wk HAVING COUNT(*) = 7),
blocks AS (SELECT keyed.* FROM keyed JOIN full_weeks USING (yr, wk)),
ranked AS (
  SELECT dow,
         CAST(RANK() OVER (PARTITION BY yr, wk ORDER BY y) AS DOUBLE)
         + (CAST(COUNT(*) OVER (PARTITION BY yr, wk, y) AS DOUBLE) - 1) / 2.0 AS r
  FROM blocks),
rj AS (SELECT dow, SUM(CAST(ROUND(r, 1) AS DECIMAL(18,1))) AS rsum
       FROM ranked GROUP BY dow),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks
       FROM (SELECT DISTINCT yr, wk FROM blocks)),
agg AS (
  SELECT ANY_VALUE(n_blocks) AS n_blocks,
         SUM(CAST(rsum AS DOUBLE) * CAST(rsum AS DOUBLE)) AS sr2
  FROM rj CROSS JOIN nb)
SELECT n_blocks,
       ROUND(sr2, 2) AS sum_rank_sq,
       ROUND(12.0 / (CAST(n_blocks AS DOUBLE) * 7.0 * 8.0) * sr2
             - 3.0 * CAST(n_blocks AS DOUBLE) * 8.0, 6) AS friedman_chi2
FROM agg
"""

QUERIES["q_friedman_seasonality"] = QuerySpec(
    q_friedman_seasonality,
    Q_FRIEDMAN_SQL,
    "Friedman rank test for weekday effect over complete-week blocks "
    "— partitioned average ranks, integer-pinned rank sums",
)


# --------------------------------------------------- Yuen trimmed t
# Groups: 1-URGENT vs other orders on o_totalprice; 20% symmetric
# trim. t = (m1−m2)/√(d1+d2), d = s²_w·(n−1)/(h·(h−1)) with s²_w the
# winsorized variance and h the trimmed count.


def q_yuen_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT").alias("g"),
        F.col("o_totalprice").cast("double").alias("x"),
    )
    cuts = orders.groupBy("g").agg(
        F.percentile("x", 0.2).alias("lo"),
        F.percentile("x", 0.8).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    j = orders.join(F.broadcast(cuts), "g")
    wx = F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi"))
    agg = j.groupBy("g").agg(
        F.first("n").alias("n"),
        F.sum(
            F.when((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")), 1)
            .otherwise(0)
            .cast("long")
        ).alias("h"),
        (
            F.sum(
                F.when(
                    (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")),
                    F.round(F.col("x"), 2),
                ).cast("decimal(28,2)")
            ).cast("double")
        ).alias("tsum"),
        F.sum(F.round(wx, 2).cast("decimal(28,2)")).cast("double").alias("wsum"),
        F.sum(
            F.round(wx * wx, 2).cast("decimal(38,2)")
        ).cast("double").alias("wsum2"),
    )
    nd = F.col("n").cast("double")
    hd = F.col("h").cast("double")
    tmean = F.col("tsum") / hd
    wvar = (nd * F.col("wsum2") - F.col("wsum") ** 2) / (nd * (nd - 1))
    d = wvar * (nd - 1) / (hd * (hd - 1))
    per = agg.select("g", "n", "h", tmean.alias("tm"), d.alias("d"))
    a = per.where(F.col("g")).select(
        F.col("n").alias("n1"), F.col("h").alias("h1"),
        F.col("tm").alias("m1"), F.col("d").alias("d1"),
    )
    b = per.where(~F.col("g")).select(
        F.col("n").alias("n2"), F.col("h").alias("h2"),
        F.col("tm").alias("m2"), F.col("d").alias("d2"),
    )
    return a.crossJoin(b).select(
        "h1",
        "h2",
        F.round("m1", 6).alias("trimmed_mean_urgent"),
        F.round("m2", 6).alias("trimmed_mean_other"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(F.col("d1") + F.col("d2")), 6
        ).alias("yuen_t"),
    )


Q_YUEN_SQL = """
WITH src AS (
  SELECT o_orderpriority = '1-URGENT' AS g,
         CAST(o_totalprice AS DOUBLE) AS x
  FROM orders),
cuts AS (
  SELECT g, quantile_cont(x, 0.2) AS lo, quantile_cont(x, 0.8) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM src GROUP BY g),
agg AS (
  SELECT src.g, ANY_VALUE(n) AS n,
         CAST(SUM(CASE WHEN x >= lo AND x <= hi THEN 1 ELSE 0 END) AS BIGINT) AS h,
         CAST(SUM(CASE WHEN x >= lo AND x <= hi
                       THEN CAST(ROUND(x, 2) AS DECIMAL(28,2)) END) AS DOUBLE)
             AS tsum,
         CAST(SUM(CAST(ROUND(LEAST(GREATEST(x, lo), hi), 2) AS DECIMAL(28,2)))
              AS DOUBLE) AS wsum,
         CAST(SUM(CAST(ROUND(LEAST(GREATEST(x, lo), hi)
                             * LEAST(GREATEST(x, lo), hi), 2) AS DECIMAL(38,2)))
              AS DOUBLE) AS wsum2
  FROM src JOIN cuts ON src.g = cuts.g
  GROUP BY src.g),
per AS (
  SELECT g, n, h, tsum / h AS tm,
         ((CAST(n AS DOUBLE) * wsum2 - wsum * wsum)
          / (CAST(n AS DOUBLE) * (n - 1)))
         * (CAST(n AS DOUBLE) - 1) / (CAST(h AS DOUBLE) * (h - 1)) AS d
  FROM agg)
SELECT a.h AS h1, b.h AS h2,
       ROUND(a.tm, 6) AS trimmed_mean_urgent,
       ROUND(b.tm, 6) AS trimmed_mean_other,
       ROUND((a.tm - b.tm) / SQRT(a.d + b.d), 6) AS yuen_t
FROM per a CROSS JOIN per b
WHERE a.g AND NOT b.g
"""

QUERIES["q_yuen_test"] = QuerySpec(
    q_yuen_test,
    Q_YUEN_SQL,
    "Yuen 20%-trimmed two-sample t — exact percentile cuts, "
    "winsorized decimal moments",
)

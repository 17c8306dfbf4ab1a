"""Round-9 surface extensions, batch T (SURVEY §2.3 N r9): the BI
staples still missing — month-over-month / year-over-year growth (the
first report anyone builds), iterative proportional fitting (raking:
reweight a biased sample to known population margins — the survey/
panel-weighting primitive), and moving-average crossover signals (the
MA5/MA20 golden-cross detector over the daily revenue curve).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------- MoM / YoY growth (the BI staple)
# Monthly revenue with lag-1 and lag-12 percentage changes. DECIMAL-
# exact monthly sums; the month spine is the data's own months (a
# missing month would shift lags — the fixture's months are dense,
# and the dense-spine variant is one sequence() join away).


def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    monthly = orders.groupBy("m").agg(F.sum("v").cast("decimal(38,2)").alias("rev"))
    w = Window.orderBy("m")
    return (
        monthly.select(
            F.date_format("m", "yyyy-MM").alias("month"),
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                (F.col("rev") - F.lag("rev", 1).over(w)).cast("double")
                / F.lag("rev", 1).over(w).cast("double") * 100.0,
                4,
            ).alias("mom_pct"),
            F.round(
                (F.col("rev") - F.lag("rev", 12).over(w)).cast("double")
                / F.lag("rev", 12).over(w).cast("double") * 100.0,
                4,
            ).alias("yoy_pct"),
        )
        .orderBy("month")
    )


Q_YOY_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(rev - LAG(rev, 1) OVER (ORDER BY m) AS DOUBLE)
             / CAST(LAG(rev, 1) OVER (ORDER BY m) AS DOUBLE) * 100.0, 4) AS mom_pct,
       ROUND(CAST(rev - LAG(rev, 12) OVER (ORDER BY m) AS DOUBLE)
             / CAST(LAG(rev, 12) OVER (ORDER BY m) AS DOUBLE) * 100.0, 4) AS yoy_pct
FROM monthly
ORDER BY month
"""

QUERIES["q_yoy_growth"] = QuerySpec(
    q_yoy_growth,
    Q_YOY_SQL,
    "month-over-month and year-over-year revenue growth — decimal-"
    "exact monthly sums, lag-1/lag-12 windows",
)


# -------------------------- raking / IPF (survey weighting)
# A biased sample (customers WITH orders) is reweighted so its
# weighted (segment × nation-group) cells match the FULL population's
# segment and nation-group margins — three unrolled row/column
# scaling rounds (IPF converges geometrically; 3 rounds ≈ 1e-3 on
# margins this size). Every table is domain-bounded (5 segments × 5
# groups), so the iteration is joins over tiny frames; the sample
# membership itself is the only corpus-sized scan.


def _rake_once(cells: DataFrame, row_t: DataFrame, col_t: DataFrame) -> DataFrame:
    rsum = cells.groupBy("seg").agg(F.sum("w").alias("rs"))
    r = (
        cells.join(rsum, "seg")
        .join(row_t, "seg")
        .select("seg", "ng", (F.col("w") * F.col("rt") / F.col("rs")).alias("w"))
    )
    csum = r.groupBy("ng").agg(F.sum("w").alias("cs"))
    return (
        r.join(csum, "ng")
        .join(col_t, "ng")
        .select("seg", "ng", (F.col("w") * F.col("ct") / F.col("cs")).alias("w"))
    )


def q_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("ng"),
    )
    buyers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    sample = cust.join(buyers, "c_custkey", "left_semi")
    cells = sample.groupBy("seg", "ng").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    row_t = cust.groupBy("seg").agg(F.count(F.lit(1)).cast("double").alias("rt"))
    col_t = cust.groupBy("ng").agg(F.count(F.lit(1)).cast("double").alias("ct"))
    w = cells
    for _ in range(3):
        w = _rake_once(w, row_t, col_t)
    achieved = w.groupBy("seg").agg(F.sum("w").alias("ach"))
    return (
        w.join(F.broadcast(achieved), "seg")
        .join(F.broadcast(row_t), "seg")
        .select(
            "seg",
            F.col("ng").cast("long").alias("ng"),
            F.round("w", 6).alias("raked_weight"),
            F.round(F.col("ach") - F.col("rt"), 6).alias("row_margin_gap"),
        )
        .orderBy("seg", "ng")
    )


Q_RAKING_SQL = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment AS seg, c_nationkey % 5 AS ng FROM customer),
sample AS (
  SELECT * FROM cust WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)),
cells AS (
  SELECT seg, ng, CAST(COUNT(*) AS DOUBLE) AS w FROM sample GROUP BY seg, ng),
row_t AS (SELECT seg, CAST(COUNT(*) AS DOUBLE) AS rt FROM cust GROUP BY seg),
col_t AS (SELECT ng, CAST(COUNT(*) AS DOUBLE) AS ct FROM cust GROUP BY ng),
r1 AS (
  SELECT c.seg, c.ng, c.w * rt / rs AS w
  FROM cells c
  JOIN (SELECT seg, SUM(w) AS rs FROM cells GROUP BY seg) s ON c.seg = s.seg
  JOIN row_t ON c.seg = row_t.seg),
c1 AS (
  SELECT r.seg, r.ng, r.w * ct / cs AS w
  FROM r1 r
  JOIN (SELECT ng, SUM(w) AS cs FROM r1 GROUP BY ng) s ON r.ng = s.ng
  JOIN col_t ON r.ng = col_t.ng),
r2 AS (
  SELECT c.seg, c.ng, c.w * rt / rs AS w
  FROM c1 c
  JOIN (SELECT seg, SUM(w) AS rs FROM c1 GROUP BY seg) s ON c.seg = s.seg
  JOIN row_t ON c.seg = row_t.seg),
c2 AS (
  SELECT r.seg, r.ng, r.w * ct / cs AS w
  FROM r2 r
  JOIN (SELECT ng, SUM(w) AS cs FROM r2 GROUP BY ng) s ON r.ng = s.ng
  JOIN col_t ON r.ng = col_t.ng),
r3 AS (
  SELECT c.seg, c.ng, c.w * rt / rs AS w
  FROM c2 c
  JOIN (SELECT seg, SUM(w) AS rs FROM c2 GROUP BY seg) s ON c.seg = s.seg
  JOIN row_t ON c.seg = row_t.seg),
c3 AS (
  SELECT r.seg, r.ng, r.w * ct / cs AS w
  FROM r3 r
  JOIN (SELECT ng, SUM(w) AS cs FROM r3 GROUP BY ng) s ON r.ng = s.ng
  JOIN col_t ON r.ng = col_t.ng),
achieved AS (SELECT seg, SUM(w) AS ach FROM c3 GROUP BY seg)
SELECT c3.seg, CAST(c3.ng AS BIGINT) AS ng, ROUND(c3.w, 6) AS raked_weight,
       ROUND(ach - rt, 6) AS row_margin_gap
FROM c3 JOIN achieved ON c3.seg = achieved.seg
        JOIN row_t ON c3.seg = row_t.seg
ORDER BY c3.seg, c3.ng
"""

QUERIES["q_raking_ipf"] = QuerySpec(
    q_raking_ipf,
    Q_RAKING_SQL,
    "raking (IPF): reweight the buyers sample to full-population "
    "segment × nation-group margins — 3 unrolled scaling rounds over "
    "domain-bounded cells",
)


# ---------------------- moving-average crossover signals
# MA5 vs MA20 of daily revenue: a signal fires on the day the short
# average crosses the long one (sign change of the spread). Both
# averages require FULL windows so the two engines agree on the
# series head. Output: crossing days with direction — curve-sized
# after the daily rollup.


def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    daily = orders.groupBy("d").agg(F.sum("v").cast("decimal(38,2)").alias("rev"))
    w = Window.orderBy("d")
    w5 = w.rowsBetween(-4, 0)
    w20 = w.rowsBetween(-19, 0)
    ma = daily.select(
        "d",
        F.when(F.count("rev").over(w5) == 5, F.avg(F.col("rev").cast("double")).over(w5)).alias("ma5"),
        F.when(F.count("rev").over(w20) == 20, F.avg(F.col("rev").cast("double")).over(w20)).alias("ma20"),
    ).where(F.col("ma20").isNotNull())
    signed = ma.select(
        "d", (F.col("ma5") > F.col("ma20")).cast("int").alias("above")
    )
    sig = signed.select(
        "d",
        "above",
        F.lag("above").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull() & (F.col("above") != F.col("prev")))
    return sig.select(
        F.date_format("d", "yyyy-MM-dd").alias("cross_date"),
        F.when(F.col("above") == 1, F.lit("golden")).otherwise(F.lit("death")).alias(
            "signal"
        ),
    ).orderBy("cross_date")


Q_MA_CROSS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1),
ma AS (
  SELECT d,
         CASE WHEN COUNT(rev) OVER (ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) = 5
              THEN AVG(CAST(rev AS DOUBLE)) OVER (ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) END AS ma5,
         CASE WHEN COUNT(rev) OVER (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) = 20
              THEN AVG(CAST(rev AS DOUBLE)) OVER (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) END AS ma20
  FROM daily),
signed AS (
  SELECT d, CASE WHEN ma5 > ma20 THEN 1 ELSE 0 END AS above
  FROM ma WHERE ma20 IS NOT NULL),
sig AS (
  SELECT d, above, LAG(above) OVER (ORDER BY d) AS prev FROM signed)
SELECT strftime(d, '%Y-%m-%d') AS cross_date,
       CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS signal
FROM sig
WHERE prev IS NOT NULL AND above <> prev
ORDER BY cross_date
"""

QUERIES["q_ma_crossover"] = QuerySpec(
    q_ma_crossover,
    Q_MA_CROSS_SQL,
    "MA5/MA20 crossover signals over daily revenue — full-window "
    "averages, sign-change detection, curve-sized",
)

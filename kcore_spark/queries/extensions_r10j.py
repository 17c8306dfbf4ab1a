"""Round-10 surface extensions, batch J (SURVEY §2.3 N r10): the
commerce-analytics block — per-brand return rates with Wilson score
intervals (rank by the LOWER bound, the statistically sound way to
rank small-n rates), the discount-response curve with its OLS slope,
unit-price dispersion per brand, and the ship-month seasonality
index.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: counts/cents are integer sums; unit prices and response
means are decimal sums of rounded per-row values; Wilson bounds and
the OLS slope are closed-form doubles computed identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_Z = 1.959963984540054  # 95%


# ------------------------ return rate per brand, Wilson-ranked
# Ranking raw rates overweights tiny samples; the Wilson lower bound
# is the standard fix (the "sorting by average rating" classic). Top
# 10 brands by LCB descending — the defensible "worst brands" list.


def q_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    per = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("int")).alias("r"),
        )
    )
    n = F.col("n").cast("double")
    p = F.col("r") / n
    z2 = F.lit(_Z * _Z)
    center = p + z2 / (2 * n)
    margin = F.lit(_Z) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    denom = 1 + z2 / n
    lcb = (center - margin) / denom
    ucb = (center + margin) / denom
    out = per.select(
        "p_brand",
        F.col("n").cast("long").alias("n_items"),
        F.col("r").cast("long").alias("n_returned"),
        F.round(p, 6).alias("return_rate"),
        F.round(lcb, 6).alias("wilson_lcb"),
        F.round(ucb, 6).alias("wilson_ucb"),
    )
    return out.orderBy(F.col("wilson_lcb").desc(), "p_brand").limit(10)


Q_WILSON_SQL = f"""
WITH per AS (
  SELECT p.p_brand, COUNT(*) AS n,
         SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand),
calc AS (
  SELECT p_brand, n, r,
         r / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nd
  FROM per)
SELECT p_brand, CAST(n AS BIGINT) AS n_items, CAST(r AS BIGINT) AS n_returned,
       ROUND(p, 6) AS return_rate,
       ROUND((p + {_Z}*{_Z} / (2*nd)
              - {_Z} * SQRT(p*(1-p)/nd + {_Z}*{_Z}/(4*nd*nd)))
             / (1 + {_Z}*{_Z}/nd), 6) AS wilson_lcb,
       ROUND((p + {_Z}*{_Z} / (2*nd)
              + {_Z} * SQRT(p*(1-p)/nd + {_Z}*{_Z}/(4*nd*nd)))
             / (1 + {_Z}*{_Z}/nd), 6) AS wilson_ucb
FROM calc
ORDER BY wilson_lcb DESC, p_brand
LIMIT 10
"""

QUERIES["q_return_rate_wilson"] = QuerySpec(
    q_return_rate_wilson,
    Q_WILSON_SQL,
    "per-brand return rates with Wilson 95% intervals, top-10 by "
    "LOWER bound — small-n-safe rate ranking",
)


# ------------------------------- discount-response curve + slope
# Average quantity per discount level (the ~11 discrete discounts),
# then the OLS slope of mean quantity on discount across levels —
# the first-order demand-response readout. Level means are decimal;
# the slope is closed-form over the <= 11-point curve.


def q_discount_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount"), 2).cast("decimal(4,2)").alias("disc"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    per = li.groupBy("disc").agg(
        F.count(F.lit(1)).alias("n"),
        F.round((F.sum("qty") / F.count(F.lit(1))).cast("double"), 6).alias(
            "avg_qty"
        ),
    )
    m = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("disc").cast("double")).alias("sx"),
        F.sum(F.col("disc").cast("double") * F.col("disc").cast("double")).alias(
            "sxx"
        ),
        F.sum("avg_qty").alias("sy"),
        F.sum(F.col("disc").cast("double") * F.col("avg_qty")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("k")
    return m.select(
        F.col("k").cast("long").alias("n_levels"),
        F.round(slope, 6).alias("qty_per_discount_slope"),
        F.round(intercept, 6).alias("intercept_qty"),
    )


Q_DISC_SQL = """
WITH per AS (
  SELECT CAST(ROUND(l_discount, 2) AS DECIMAL(4,2)) AS disc,
         COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*)
                    AS DOUBLE), 6) AS avg_qty
  FROM lineitem GROUP BY 1),
m AS (
  SELECT COUNT(*) AS k,
         SUM(CAST(disc AS DOUBLE)) AS sx,
         SUM(CAST(disc AS DOUBLE) * CAST(disc AS DOUBLE)) AS sxx,
         SUM(avg_qty) AS sy,
         SUM(CAST(disc AS DOUBLE) * avg_qty) AS sxy
  FROM per)
SELECT CAST(k AS BIGINT) AS n_levels,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
         AS qty_per_discount_slope,
       ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 6)
         AS intercept_qty
FROM m
"""

QUERIES["q_discount_response"] = QuerySpec(
    q_discount_response,
    Q_DISC_SQL,
    "discount-response OLS slope over the per-level mean-quantity "
    "curve — the first-order demand readout",
)


# ------------------------------- unit-price dispersion per brand
# CV of the per-line unit price (extendedprice / quantity) within
# each brand — pricing-consistency audit; top 10 most dispersed.
# Unit prices as whole cents via integer division; moment sums stay
# integer/decimal, one double formula per output row.


def q_unit_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unit price in WHOLE CENTS via integer division (cents div qty):
    # rounding the extendedprice/quantity DOUBLE at 2 dp is boundary-
    # prone and Java vs DuckDB round boundary doubles differently
    # (observed 1-cent per-row flips); integer div is engine-exact
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("unit_c"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    per = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("unit_c").alias("s"),
            F.sum(F.col("unit_c").cast("decimal(19,0)") * F.col("unit_c"))
            .cast("decimal(38,0)")
            .alias("q"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("n").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    mean4 = F.expr("s * 100 div n") / F.lit(10000.0)
    out = per.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        mean4.alias("mean_unit_price"),
        F.round(F.sqrt(var) / mean, 6).alias("cv"),
    )
    return out.orderBy(F.col("cv").desc(), "p_brand").limit(10)


Q_CV_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           // CAST(l_quantity AS BIGINT) AS unit_c
  FROM lineitem),
per AS (
  SELECT p.p_brand, COUNT(*) AS n, SUM(unit_c) AS s,
         CAST(SUM(CAST(unit_c AS HUGEINT) * unit_c) AS DECIMAL(38,0)) AS q
  FROM li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY p.p_brand)
SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
       (s * 100 // n) / 10000.0 AS mean_unit_price,
       ROUND(SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1)))
             / (CAST(s AS DOUBLE) / n), 6) AS cv
FROM per
ORDER BY cv DESC, p_brand
LIMIT 10
"""

QUERIES["q_unit_price_dispersion"] = QuerySpec(
    q_unit_price_dispersion,
    Q_CV_SQL,
    "unit-price coefficient of variation per brand (decimal moments, "
    "cents domain), top-10 most dispersed — pricing consistency",
)


# ------------------------------------ ship-month seasonality index
# Revenue share by calendar month (across all years) vs the uniform
# 1/12 — the month-of-year seasonality index a demand planner uses.
# Integer cents sums; one 12-row output.


def q_ship_month_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.month("l_shipdate").alias("m"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    per = li.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").alias("cents"),
    )
    tot = per.agg(F.sum("cents").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("m").cast("int").alias("month"),
            "n_lines",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") / F.col("total") * 12, 6).alias(
                "seasonality_index"
            ),
        )
        .orderBy("month")
    )


Q_SEASON_SQL = """
WITH li AS (
  SELECT EXTRACT(month FROM l_shipdate) AS m,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem),
per AS (
  SELECT m, COUNT(*) AS n_lines, SUM(cents) AS cents FROM li GROUP BY m),
tot AS (SELECT SUM(cents) AS total FROM per)
SELECT CAST(m AS INTEGER) AS month,
       CAST(n_lines AS BIGINT) AS n_lines,
       ROUND(cents / 100.0, 2) AS revenue,
       ROUND(cents * 1.0 / total * 12, 6) AS seasonality_index
FROM per, tot
ORDER BY month
"""

QUERIES["q_ship_month_seasonality"] = QuerySpec(
    q_ship_month_seasonality,
    Q_SEASON_SQL,
    "ship-month revenue seasonality index (share vs uniform 1/12, "
    "integer cents) — the demand-planning calendar",
)

"""Round-10 surface extensions, batch AC (SURVEY §2.3 N r10): the
statistical-process-control block — the X-bar control chart over
daily subgroup means (center line, 3-sigma control limits from the
within-subgroup variation, out-of-control day count) and the
Cp/Cpk process-capability indices against pinned spec limits. The
operational twin of the drift family (PSI/CUSUM/EWMA already
registered).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: subgroup moments are decimal sums of rounded values;
limits are closed-form doubles; violation counts are integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------- X-bar chart over daily subgroups
# Subgroup = day; the chart monitors the daily MEAN of `value`.
# Limits: grand mean +/- 3 * s_pooled / sqrt(n_bar) with s_pooled
# from the pooled within-day variance — the standard X-bar/s chart.
# Output: the chart constants + the out-of-control day count.


def q_xbar_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"),
    )
    per = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,12)").alias("q"),
    )
    # within-day sum of squares: q - s^2/n, pooled over days
    ssw = F.round(
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"),
        10,
    ).cast("decimal(28,10)")
    m = per.select("n", "s", ssw.alias("ssw")).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.sum("ssw").alias("ssw_tot"),
    )
    grand = F.col("stot").cast("double") / F.col("nn")
    s_pooled = F.sqrt(
        F.col("ssw_tot").cast("double") / (F.col("nn") - F.col("k"))
    )
    n_bar = F.col("nn").cast("double") / F.col("k")
    half = 3.0 * s_pooled / F.sqrt(n_bar)
    consts = m.select(
        F.col("k").cast("long").alias("n_days"),
        F.round(grand, 6).alias("center_line"),
        F.round(grand - half, 6).alias("lcl"),
        F.round(grand + half, 6).alias("ucl"),
    )
    means = per.select(
        "day", (F.col("s").cast("double") / F.col("n")).alias("xbar")
    )
    viol = (
        means.crossJoin(F.broadcast(consts))
        .where((F.col("xbar") < F.col("lcl")) | (F.col("xbar") > F.col("ucl")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_out_of_control"))
    )
    return consts.crossJoin(F.broadcast(viol)).select(
        "n_days", "center_line", "lcl", "ucl", "n_out_of_control"
    )


Q_XBAR_SQL = """
WITH src AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v
  FROM events),
per AS (
  SELECT day, COUNT(*) AS n,
         CAST(SUM(v) AS DECIMAL(38,6)) AS s,
         CAST(SUM(v * v) AS DECIMAL(38,12)) AS q
  FROM src GROUP BY day),
w AS (
  SELECT day, n, s,
         CAST(ROUND(CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 10)
              AS DECIMAL(28,10)) AS ssw
  FROM per),
m AS (
  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s) AS stot, SUM(ssw) AS ssw_tot
  FROM w),
consts AS (
  SELECT CAST(k AS BIGINT) AS n_days,
         ROUND(CAST(stot AS DOUBLE) / nn, 6) AS center_line,
         ROUND(CAST(stot AS DOUBLE) / nn
               - 3.0 * SQRT(CAST(ssw_tot AS DOUBLE) / (nn - k))
                 / SQRT(CAST(nn AS DOUBLE) / k), 6) AS lcl,
         ROUND(CAST(stot AS DOUBLE) / nn
               + 3.0 * SQRT(CAST(ssw_tot AS DOUBLE) / (nn - k))
                 / SQRT(CAST(nn AS DOUBLE) / k), 6) AS ucl
  FROM m),
viol AS (
  SELECT COUNT(*) AS n_out_of_control
  FROM per, consts
  WHERE CAST(s AS DOUBLE) / n < lcl OR CAST(s AS DOUBLE) / n > ucl)
SELECT n_days, center_line, lcl, ucl,
       CAST(n_out_of_control AS BIGINT) AS n_out_of_control
FROM consts, viol
"""

QUERIES["q_xbar_control_chart"] = QuerySpec(
    q_xbar_control_chart,
    Q_XBAR_SQL,
    "X-bar control chart over daily value means (pooled within-day "
    "sigma, 3-sigma limits, violation count) — SPC monitoring",
)


# ----------------------------------- process capability (Cp / Cpk)
# Against pinned spec limits on `value`: Cp = (USL-LSL)/(6 sigma),
# Cpk = min(USL-mu, mu-LSL)/(3 sigma), plus the observed
# out-of-spec share. Decimal moments, closed-form doubles.

_LSL, _USL = -3.0, 3.0


def q_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v")
    )
    m = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,12)").alias("q"),
        F.sum(
            ((F.col("v") < _LSL) | (F.col("v") > _USL)).cast("int")
        ).alias("n_oos"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("n").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    cp = (F.lit(_USL) - F.lit(_LSL)) / (6.0 * sd)
    cpk = F.least(F.lit(_USL) - mu, mu - F.lit(_LSL)) / (3.0 * sd)
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(mu, 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(cp, 6).alias("cp"),
        F.round(cpk, 6).alias("cpk"),
        F.round(F.col("n_oos") / F.col("n").cast("double"), 6).alias(
            "out_of_spec_share"
        ),
    )


Q_CPK_SQL = f"""
WITH src AS (
  SELECT CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v FROM events),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(v) AS DECIMAL(38,6)) AS s,
         CAST(SUM(v * v) AS DECIMAL(38,12)) AS q,
         SUM(CASE WHEN v < {_LSL} OR v > {_USL} THEN 1 ELSE 0 END) AS n_oos
  FROM src),
calc AS (
  SELECT n, n_oos,
         CAST(s AS DOUBLE) / n AS mu,
         SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * (n - 1))) AS sd
  FROM m)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(mu, 6) AS mean, ROUND(sd, 6) AS sd,
       ROUND(({_USL} - {_LSL}) / (6.0 * sd), 6) AS cp,
       ROUND(LEAST({_USL} - mu, mu - {_LSL}) / (3.0 * sd), 6) AS cpk,
       ROUND(n_oos / CAST(n AS DOUBLE), 6) AS out_of_spec_share
FROM calc
"""

QUERIES["q_process_capability"] = QuerySpec(
    q_process_capability,
    Q_CPK_SQL,
    "Cp/Cpk process capability of the value stream against pinned "
    "spec limits (decimal moments) — SPC capability",
)

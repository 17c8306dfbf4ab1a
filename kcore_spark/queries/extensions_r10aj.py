"""Round-10 surface extensions, batch AJ (SURVEY §2.3 N r10): the
econometrics-diagnostics block — Breusch-Pagan (heteroscedasticity:
LM = n·R² of squared residuals on the regressor; the variance
companion to q_durbin_watson's autocorrelation), the Chow test
(structural break: pooled-vs-split SSR F-test at a known break
date), and a Granger-style lagged F-test (does yesterday's click
revenue improve today's purchase-revenue forecast beyond its own
lag).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: regression coefficients come from decimal-exact raw
moments and are ROUND(·,9)-pinned before the residual pass; residual
aggregates are ROUND-pinned decimal sums (order-free); BP scales y
to thousands so every squared residual stays in exact-decimal range
(its LM is scale-invariant); Chow keeps y in raw units because its
moments are already exact decimals and a decimal division would hit
engine-specific result-scale rounding.
Scale: two scans (moments, residuals) with a 1-row coefficient
broadcast between them; Chow is ONE grouped moment agg (group
moments are additive, so the pooled row is computed from the two
group rows — no third scan); Granger runs on the daily series
(calendar-bounded lags, adjudicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------------------------------- Breusch-Pagan LM


def q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    # r13: the fixture ships one row group per file, so the scan (and
    # the expensive BigDecimal moment fold riding it) is a single
    # task. Spread the projected 2-column slice across the session's
    # parallelism once and persist it — BOTH moment passes (m1
    # coefficients, m2 residuals) then aggregate in parallel from the
    # cache instead of re-running the serial scan+fold twice. Decimal
    # sums are order-free, so the repartition cannot change the
    # result. At cluster scale the conf-driven split planning already
    # yields parallel scans and this repartition coalesces into the
    # same shuffle count.
    li = transient_persist(
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("decimal(15,2)").alias("x"),
            (F.col("l_extendedprice").cast("decimal(15,2)") / 1000).alias("y"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    m1 = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    b = (nd * F.col("sxy").cast("double") - sx * sy) / (
        nd * F.col("sxx").cast("double") - sx * sx
    )
    coef = m1.select(
        "n",
        "sx",
        "sxx",
        F.round(b, 9).alias("b"),
        F.round((sy - b * sx) / nd, 9).alias("a"),
    )
    res = li.crossJoin(F.broadcast(coef))
    e = F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("x").cast("double")
    g = F.round(e * e, 9)
    m2 = res.agg(
        F.first("n").alias("n"),
        F.first("sx").alias("sx"),
        F.first("sxx").alias("sxx"),
        F.sum(g.cast("decimal(28,9)")).alias("sg"),
        F.sum(F.round(F.col("x").cast("double") * g, 6).cast("decimal(28,6)")).alias("sxg"),
        F.sum(F.round(g * g, 6).cast("decimal(28,6)")).alias("sgg"),
    )
    nd2 = F.col("n").cast("double")
    sg, sxg, sgg = (
        F.col("sg").cast("double"),
        F.col("sxg").cast("double"),
        F.col("sgg").cast("double"),
    )
    sx2, sxx2 = F.col("sx").cast("double"), F.col("sxx").cast("double")
    num = (nd2 * sxg - sx2 * sg) ** 2
    den = (nd2 * sxx2 - sx2 * sx2) * (nd2 * sgg - sg * sg)
    r2 = num / den
    return m2.select(
        "n",
        F.round(r2, 6).alias("r2_aux"),
        F.round(nd2 * r2, 6).alias("bp_lm"),
    )


Q_BP_SQL = """
WITH src AS (
  SELECT CAST(l_quantity AS DECIMAL(15,2)) AS x,
         CAST(l_extendedprice AS DECIMAL(15,2)) / 1000 AS y
  FROM lineitem),
m1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM src),
coef AS (
  SELECT n, sx, sxx,
         ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS b,
         ROUND((CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE), 9) AS a
  FROM m1),
m2 AS (
  SELECT ANY_VALUE(n) AS n, ANY_VALUE(sx) AS sx, ANY_VALUE(sxx) AS sxx,
         SUM(CAST(ROUND((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
                        * (CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)), 9)
                  AS DECIMAL(28,9))) AS sg,
         SUM(CAST(ROUND(CAST(x AS DOUBLE)
                        * ROUND((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
                                * (CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)), 9), 6)
                  AS DECIMAL(28,6))) AS sxg,
         SUM(CAST(ROUND(ROUND((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
                              * (CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)), 9)
                        * ROUND((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
                                * (CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)), 9), 6)
                  AS DECIMAL(28,6))) AS sgg
  FROM src CROSS JOIN coef)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sg AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sg AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)
                   - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))), 6) AS r2_aux,
       ROUND(CAST(n AS DOUBLE)
             * (CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sg AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sg AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)
                   - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))), 6) AS bp_lm
FROM m2
"""

QUERIES["q_breusch_pagan"] = QuerySpec(
    q_breusch_pagan,
    Q_BP_SQL,
    "Breusch-Pagan heteroscedasticity LM — pinned OLS coefficients, "
    "decimal-exact residual moments, two scans",
)


# ---------------------------------------------------------- Chow test
# Group moments are additive, so the pooled SSR comes from summing
# the two group rows — one grouped agg, no third scan. k = 2
# parameters per regime. y stays in RAW units: the F is scale-
# invariant and a decimal division would hit engine-specific
# result-scale rounding rules.


def q_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).alias("pre"),
        F.col("l_quantity").cast("decimal(15,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("y"),
    )
    g = li.groupBy("pre").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def ssr(n, sx, sy, sxy, sxx, syy):
        cxx = sxx - sx * sx / n
        cxy = sxy - sx * sy / n
        cyy = syy - sy * sy / n
        return cyy - cxy * cxy / cxx

    tot = g.agg(
        F.sum("n").cast("double").alias("n"),
        F.sum(F.col("sx")).cast("double").alias("sx"),
        F.sum(F.col("sy")).cast("double").alias("sy"),
        F.sum(F.col("sxy")).cast("double").alias("sxy"),
        F.sum(F.col("sxx")).cast("double").alias("sxx"),
        F.sum(F.col("syy")).cast("double").alias("syy"),
        F.sum(
            F.when(F.col("pre"), F.col("n")).otherwise(F.lit(0))
        ).cast("long").alias("n_pre"),
    )
    per = g.select(
        "pre",
        ssr(
            F.col("n").cast("double"),
            F.col("sx").cast("double"),
            F.col("sy").cast("double"),
            F.col("sxy").cast("double"),
            F.col("sxx").cast("double"),
            F.col("syy").cast("double"),
        ).alias("ssr_g"),
        F.col("n").alias("n_g"),
    ).agg(F.sum("ssr_g").alias("ssr_split"), F.sum("n_g").cast("long").alias("n_all"))
    j = tot.crossJoin(per)
    ssr_pool = ssr(
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx"), F.col("syy")
    )
    f_stat = ((ssr_pool - F.col("ssr_split")) / 2) / (
        F.col("ssr_split") / (F.col("n") - 4)
    )
    return j.select(
        F.col("n_all").alias("n"),
        "n_pre",
        F.round(ssr_pool, 6).alias("ssr_pooled"),
        F.round("ssr_split", 6).alias("ssr_split"),
        F.round(f_stat, 6).alias("chow_f"),
    )


Q_CHOW_SQL = """
WITH src AS (
  SELECT l_shipdate < TIMESTAMP '1996-01-01' AS pre,
         CAST(l_quantity AS DECIMAL(15,2)) AS x,
         CAST(l_extendedprice AS DECIMAL(15,2)) AS y
  FROM lineitem),
g AS (
  SELECT pre, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM src GROUP BY pre),
tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS n, CAST(SUM(sx) AS DOUBLE) AS sx,
         CAST(SUM(sy) AS DOUBLE) AS sy, CAST(SUM(sxy) AS DOUBLE) AS sxy,
         CAST(SUM(sxx) AS DOUBLE) AS sxx, CAST(SUM(syy) AS DOUBLE) AS syy,
         CAST(SUM(CASE WHEN pre THEN n ELSE 0 END) AS BIGINT) AS n_pre
  FROM g),
per AS (
  SELECT SUM((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
             AS ssr_split,
         CAST(SUM(n) AS BIGINT) AS n_all
  FROM g)
SELECT n_all AS n, n_pre,
       ROUND((syy - sy * sy / n) - (sxy - sx * sy / n) * (sxy - sx * sy / n)
             / (sxx - sx * sx / n), 6) AS ssr_pooled,
       ROUND(ssr_split, 6) AS ssr_split,
       ROUND((((syy - sy * sy / n) - (sxy - sx * sy / n) * (sxy - sx * sy / n)
               / (sxx - sx * sx / n)) - ssr_split) / 2
             / (ssr_split / (n - 4)), 6) AS chow_f
FROM tot CROSS JOIN per
"""

QUERIES["q_chow_test"] = QuerySpec(
    q_chow_test,
    Q_CHOW_SQL,
    "Chow structural-break F-test at a known break date — additive "
    "group moments, pooled SSR from the same grouped agg",
)


# ------------------------------------------------ Granger-style F-test
# Daily purchase revenue y_t: restricted y_t ~ y_{t-1} vs unrestricted
# y_t ~ y_{t-1} + x_{t-1} (x = daily click revenue). F = (SSR_r −
# SSR_u)/(SSR_u/(n−3)). Normal equations in centered form (the
# q_ols_two_features idiom); the daily series is calendar-bounded.


def q_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
                .cast("decimal(28,10)")
            )
            .cast("double")
            .alias("y"),
            F.sum(
                F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)
                .cast("decimal(28,10)")
            )
            .cast("double")
            .alias("x"),
        )
    )
    w = Window.orderBy("d")
    lagged = (
        daily.withColumn("y1", F.lag("y").over(w))
        .withColumn("x1", F.lag("x").over(w))
        .where(F.col("y1").isNotNull())
        .select("y", "y1", "x1")
    )
    means = lagged.agg(
        F.avg("y").alias("my"), F.avg("y1").alias("m1"), F.avg("x1").alias("m2")
    )
    c = lagged.crossJoin(F.broadcast(means))
    d1, d2, dy = (
        F.col("y1") - F.col("m1"),
        F.col("x1") - F.col("m2"),
        F.col("y") - F.col("my"),
    )
    m = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d1 * dy).alias("s1y"),
        F.sum(d2 * dy).alias("s2y"),
        F.sum(dy * dy).alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    ssr_u = F.col("syy") - b1 * F.col("s1y") - b2 * F.col("s2y")
    ssr_r = F.col("syy") - F.col("s1y") * F.col("s1y") / F.col("s11")
    f_stat = (ssr_r - ssr_u) / (ssr_u / (F.col("n").cast("double") - 3))
    return m.select(
        "n",
        F.round(ssr_r, 6).alias("ssr_restricted"),
        F.round(ssr_u, 6).alias("ssr_unrestricted"),
        F.round(f_stat, 6).alias("granger_f"),
    )


Q_GRANGER_SQL = """
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
                       AS DECIMAL(28,10))) AS DOUBLE) AS y,
         CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END
                       AS DECIMAL(28,10))) AS DOUBLE) AS x
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1),
lagged AS (
  SELECT y, LAG(y) OVER (ORDER BY d) AS y1, LAG(x) OVER (ORDER BY d) AS x1
  FROM daily
  QUALIFY LAG(y) OVER (ORDER BY d) IS NOT NULL),
means AS (SELECT AVG(y) AS my, AVG(y1) AS m1, AVG(x1) AS m2 FROM lagged),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM((y1 - m1) * (y1 - m1)) AS s11,
         SUM((y1 - m1) * (x1 - m2)) AS s12,
         SUM((x1 - m2) * (x1 - m2)) AS s22,
         SUM((y1 - m1) * (y - my)) AS s1y,
         SUM((x1 - m2) * (y - my)) AS s2y,
         SUM((y - my) * (y - my)) AS syy
  FROM lagged CROSS JOIN means)
SELECT n,
       ROUND(syy - s1y * s1y / s11, 6) AS ssr_restricted,
       ROUND(syy - ((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12)) * s1y
                 - ((s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12)) * s2y, 6)
           AS ssr_unrestricted,
       ROUND(((syy - s1y * s1y / s11)
              - (syy - ((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12)) * s1y
                     - ((s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12)) * s2y))
             / ((syy - ((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12)) * s1y
                     - ((s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12)) * s2y)
                / (CAST(n AS DOUBLE) - 3)), 6) AS granger_f
FROM m
"""

QUERIES["q_granger_lite"] = QuerySpec(
    q_granger_lite,
    Q_GRANGER_SQL,
    "Granger-style lagged F-test on the daily click->purchase series — "
    "centered normal equations, calendar-bounded lags",
)

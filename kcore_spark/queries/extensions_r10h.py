"""Round-10 surface extensions, batch H (SURVEY §2.3 N r10): the
forecasting block II — Holt-Winters ADDITIVE-SEASONAL smoothing (the
seasonal completion of r9's Holt linear trend; per-key state machine
in applyInPandas, WITH-RECURSIVE list-state oracle), Theil's U2
forecast-skill ratio (drift vs naive), and the partial
autocorrelation function to lag 3 (Durbin-Levinson unrolled on the
integer-exact ACF).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the smoothing recursions run the same IEEE double ops in
the same order in both engines (the q_holt_forecast precedent);
U2's cross-row sums are decimal sums of 12-dp-rounded per-row terms;
PACF is closed-form algebra on already-rounded ACF values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8g_stats import _acf_sql, q_acf_hourly

QUERIES: dict[str, QuerySpec] = {}


# ---------------- Holt-Winters additive seasonal (m = 24 hours)
# Per event type over the hourly mean-value series: level/trend/
# seasonal recursion with season length 24. Initialization is the
# textbook one (level = mean of the first season, trend = 0,
# seasonals = first-season deviations). The per-key series is
# calendar-bounded; the state machine runs in applyInPandas (keyed,
# parallel per event type) against a WITH RECURSIVE oracle whose
# seasonal state is a LIST column — both engines execute the same
# double arithmetic in the same order.

HW_ALPHA = 0.3
HW_BETA = 0.05
HW_GAMMA = 0.2
HW_M = 24


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("x")
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        xs = pdf["x"].tolist()
        m = HW_M
        l = sum(xs[:m]) / m
        b = 0.0
        s = [x - l for x in xs[:m]]
        for t in range(m, len(xs)):
            x = xs[t]
            s_old = s[t % m]
            l_prev = l
            l = HW_ALPHA * (x - s_old) + (1.0 - HW_ALPHA) * (l + b)
            b = HW_BETA * (l - l_prev) + (1.0 - HW_BETA) * b
            s[t % m] = HW_GAMMA * (x - l) + (1.0 - HW_GAMMA) * s_old
        n = len(xs)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_steps": [n],
                "level": [round(l, 6)],
                "trend": [round(b, 6)],
                "forecast_1": [round(l + b + s[n % m], 6)],
            }
        )

    out = hourly.groupBy("event_type").applyInPandas(
        hw,
        schema="event_type string, n_steps long, level double, trend double, forecast_1 double",
    )
    return out.orderBy("event_type")


Q_HW_SQL = f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS x
  FROM events GROUP BY event_type, h),
seq AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS t,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly),
init AS (
  SELECT event_type, MAX(n) AS n,
         SUM(x) / {HW_M} AS l0,
         list(x ORDER BY t) AS xs0
  FROM seq WHERE t <= {HW_M} GROUP BY event_type),
-- seasonal list state: s[i] corresponds to phase (t % m) = i-1 shifted;
-- we keep s as a list indexed by phase 0..m-1 at list positions 1..m
walk AS (
  SELECT i.event_type, {HW_M} AS t, i.n, i.l0 AS l, CAST(0.0 AS DOUBLE) AS b,
         list_transform(i.xs0, x -> x - i.l0) AS s
  FROM init i
  UNION ALL
  SELECT w.event_type, w.t + 1, w.n,
         {HW_ALPHA} * (q.x - w.s[(w.t % {HW_M}) + 1])
           + (1.0 - {HW_ALPHA}) * (w.l + w.b) AS l,
         {HW_BETA} * (({HW_ALPHA} * (q.x - w.s[(w.t % {HW_M}) + 1])
           + (1.0 - {HW_ALPHA}) * (w.l + w.b)) - w.l)
           + (1.0 - {HW_BETA}) * w.b AS b,
         list_transform(
           range(1, {HW_M} + 1),
           j -> CASE WHEN j = (w.t % {HW_M}) + 1
                THEN {HW_GAMMA} * (q.x - ({HW_ALPHA} * (q.x - w.s[(w.t % {HW_M}) + 1])
                       + (1.0 - {HW_ALPHA}) * (w.l + w.b)))
                     + (1.0 - {HW_GAMMA}) * w.s[(w.t % {HW_M}) + 1]
                ELSE w.s[j] END) AS s
  FROM walk w JOIN seq q ON q.event_type = w.event_type AND q.t = w.t + 1)
SELECT event_type, n AS n_steps,
       ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
       ROUND(l + b + s[(n % {HW_M}) + 1], 6) AS forecast_1
FROM walk
WHERE t = n
ORDER BY event_type
"""

QUERIES["q_holt_winters"] = QuerySpec(
    q_holt_winters,
    Q_HW_SQL,
    "Holt-Winters additive-seasonal smoothing (m=24) per event type: "
    "keyed applyInPandas state machine vs WITH RECURSIVE list-state "
    "oracle, bit-identical doubles",
)


# --------------------------------- Theil's U2 (drift vs naive)
# Forecast-skill ratio on the daily event-count series: the drift
# forecast y_t + (y_t - y_{t-1}) scored against the naive y_t, as
# relative-change RMSEs. U2 < 1 = the trend carries signal. Per-row
# terms (lags ride one ordered window over the daily curve) rounded
# to 12 dp, summed as DECIMAL.


def q_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.orderBy("day")
    d = (
        daily.withColumn("y1", F.lag("y", 1).over(w))
        .withColumn("y2", F.lag("y", 2).over(w))
        .where(F.col("y2").isNotNull())
    )
    # drift forecast for y_t made at t-1: y1 + (y1 - y2); naive: y1
    drift_err = (F.col("y1") * 2 - F.col("y2") - F.col("y")).cast("double") / F.col("y1")
    naive_err = (F.col("y1") - F.col("y")).cast("double") / F.col("y1")
    terms = d.select(
        F.round(drift_err * drift_err, 12).cast("decimal(28,12)").alias("de2"),
        F.round(naive_err * naive_err, 12).cast("decimal(28,12)").alias("ne2"),
    )
    m = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("de2").alias("sd"),
        F.sum("ne2").alias("sn"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.sqrt(F.col("sd").cast("double") / F.col("n")), 6).alias("rmse_drift_rel"),
        F.round(F.sqrt(F.col("sn").cast("double") / F.col("n")), 6).alias("rmse_naive_rel"),
        F.round(
            F.sqrt(F.col("sd").cast("double") / F.col("n"))
            / F.sqrt(F.col("sn").cast("double") / F.col("n")),
            6,
        ).alias("theil_u2"),
    )


Q_U2_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y FROM events GROUP BY 1),
lagged AS (
  SELECT day, y,
         LAG(y, 1) OVER (ORDER BY day) AS y1,
         LAG(y, 2) OVER (ORDER BY day) AS y2
  FROM daily),
terms AS (
  SELECT
    CAST(ROUND(POWER(CAST(y1 * 2 - y2 - y AS DOUBLE) / y1, 2), 12)
         AS DECIMAL(28,12)) AS de2,
    CAST(ROUND(POWER(CAST(y1 - y AS DOUBLE) / y1, 2), 12)
         AS DECIMAL(28,12)) AS ne2
  FROM lagged WHERE y2 IS NOT NULL),
m AS (SELECT COUNT(*) AS n, SUM(de2) AS sd, SUM(ne2) AS sn FROM terms)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(SQRT(CAST(sd AS DOUBLE) / n), 6) AS rmse_drift_rel,
       ROUND(SQRT(CAST(sn AS DOUBLE) / n), 6) AS rmse_naive_rel,
       ROUND(SQRT(CAST(sd AS DOUBLE) / n) / SQRT(CAST(sn AS DOUBLE) / n), 6)
         AS theil_u2
FROM m
"""

QUERIES["q_theil_u2"] = QuerySpec(
    q_theil_u2,
    Q_U2_SQL,
    "Theil's U2 forecast-skill ratio (drift vs naive) on the daily "
    "event-count series — decimal-exact relative-change RMSEs",
)


# ------------------- partial autocorrelation (Durbin-Levinson, lag 3)
# PACF to lag 3 by the unrolled Durbin-Levinson recursion on the
# registered integer-exact ACF values (q_acf_hourly composition, like
# q_ljung_box): phi11 = r1; phi22 = (r2 - r1^2)/(1 - r1^2);
# phi33 = (r3 - phi21 r2 - phi22 r1) / (1 - phi21 r1 - phi22 r2)
# with phi21 = phi11 - phi22 phi11. Pure algebra on rounded inputs —
# identical doubles by construction.


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    acf = q_acf_hourly(spark, sf_dir)
    piv = acf.agg(
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    return piv.select(
        F.round(r1, 8).alias("pacf_1"),
        F.round(phi22, 8).alias("pacf_2"),
        F.round(phi33, 8).alias("pacf_3"),
    )


Q_PACF_SQL = f"""
WITH acf_t AS ({_acf_sql()}),
piv AS (
  SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
         MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
         MAX(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM acf_t),
d AS (
  SELECT r1, r2, r3,
         (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
  FROM piv),
e AS (
  SELECT *, r1 - phi22 * r1 AS phi21 FROM d)
SELECT ROUND(r1, 8) AS pacf_1,
       ROUND(phi22, 8) AS pacf_2,
       ROUND((r3 - phi21 * r2 - phi22 * r1)
             / (1 - phi21 * r1 - phi22 * r2), 8) AS pacf_3
FROM e
"""

QUERIES["q_pacf"] = QuerySpec(
    q_pacf,
    Q_PACF_SQL,
    "partial autocorrelation to lag 3 (Durbin-Levinson unrolled on "
    "the integer-exact ACF) — AR-order diagnostic",
)

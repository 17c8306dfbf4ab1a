"""Round-10 surface extensions, batch C (SURVEY §2.3 N r10): the
technical-series block — Ljung-Box portmanteau whiteness test (built
on the integer-exact ACF machinery), Bollinger bands with breakout
accounting, and the simple-average RSI oscillator. The daily/hourly
curves are calendar-bounded, so their ordered windows are adjudicated
in scripts/explain_audit.py's ALLOWED_GLOBAL_WINDOW.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: window/moment sums are DECIMAL over
6-dp-rounded per-day closes (order-independent); the Ljung-Box lag
sum is a decimal sum of 18-dp-rounded per-lag terms; doubles appear
per-row or in the final statistic only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8g_stats import _acf_sql, q_acf_hourly

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- Ljung-Box portmanteau whiteness test
# Q_LB = n(n+2) * SUM_k r_k^2 / (n-k) over lags 1..6 of the hourly
# event-count series, with r_k the integer-exact ACF estimator the
# registry already pins (q_acf_hourly). Built BY COMPOSITION on that
# query's 6-row output (n recovered as n_pairs + lag), so the two
# stay consistent by construction; the lag sum is a decimal sum of
# rounded per-lag terms.


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    acf = q_acf_hourly(spark, sf_dir).withColumn(
        "n", F.col("n_pairs") + F.col("lag")
    )
    term = F.round(
        F.col("acf") * F.col("acf") / F.col("n_pairs"), 18
    ).cast("decimal(38,18)")
    return acf.agg(
        F.max("n").cast("long").alias("n_hours"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
        F.round(
            F.max("n").cast("double")
            * (F.max("n") + 2)
            * F.sum(term).cast("double"),
            6,
        ).alias("ljung_box_q"),
        F.max(F.abs(F.col("acf"))).alias("max_abs_acf"),
    )


Q_LJUNG_SQL = f"""
WITH acf_t AS ({_acf_sql()})
SELECT CAST(MAX(n_pairs + lag) AS BIGINT) AS n_hours,
       CAST(COUNT(*) AS BIGINT) AS n_lags,
       ROUND(CAST(MAX(n_pairs + lag) AS DOUBLE) * (MAX(n_pairs + lag) + 2)
             * CAST(SUM(CAST(ROUND(acf * acf / n_pairs, 18)
                             AS DECIMAL(38,18))) AS DOUBLE), 6) AS ljung_box_q,
       MAX(ABS(acf)) AS max_abs_acf
FROM acf_t
"""

QUERIES["q_ljung_box"] = QuerySpec(
    q_ljung_box,
    Q_LJUNG_SQL,
    "Ljung-Box Q over lags 1-6 of hourly event counts (composed on "
    "the integer-exact ACF) — portmanteau whiteness test",
)


# ------------------------------ Bollinger bands (7-day, 2 sigma)
# Daily close = avg(value) rounded to the decimal domain; 7-day
# rolling mean +/- 2 sigma from DECIMAL window sums (s, q), breakout
# = close outside the band computed on the PREVIOUS 7 days (shifted
# frame, so the tested day is out-of-sample). Full-window rows only.

_BOLL_W = 7


def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.avg("value"), 6).cast("decimal(18,6)").alias("close")
    )
    w = Window.orderBy("day").rowsBetween(-_BOLL_W, -1)
    cur = (
        daily.withColumn("cnt", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("close").over(w).cast("decimal(38,6)"))
        .withColumn(
            "q",
            F.sum(F.col("close") * F.col("close")).over(w).cast("decimal(38,12)"),
        )
        .where(F.col("cnt") == _BOLL_W)
    )
    mean = F.col("s").cast("double") / _BOLL_W
    sd = F.sqrt(
        (
            F.lit(_BOLL_W) * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.lit(_BOLL_W) * (_BOLL_W - 1))
    )
    up = mean + 2 * sd
    lo = mean - 2 * sd
    cur = cur.withColumn("bw", F.round(up - lo, 6).cast("decimal(18,6)"))
    return cur.agg(
        F.count(F.lit(1)).cast("long").alias("n_evaluated"),
        F.sum((F.col("close").cast("double") > up).cast("int"))
        .cast("long")
        .alias("n_breakout_up"),
        F.sum((F.col("close").cast("double") < lo).cast("int"))
        .cast("long")
        .alias("n_breakout_down"),
        F.round(F.avg("bw").cast("double"), 6).alias("avg_band_width"),
    )


Q_BOLL_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(AVG(value), 6) AS DECIMAL(18,6)) AS close
  FROM events GROUP BY 1),
win AS (
  SELECT day, close,
         COUNT(*) OVER w AS cnt,
         CAST(SUM(close) OVER w AS DECIMAL(38,6)) AS s,
         CAST(SUM(close * close) OVER w AS DECIMAL(38,12)) AS q
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {_BOLL_W} PRECEDING AND 1 PRECEDING)),
full_w AS (
  SELECT *,
         CAST(s AS DOUBLE) / {_BOLL_W} AS mean,
         SQRT(({_BOLL_W} * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / ({_BOLL_W} * ({_BOLL_W} - 1))) AS sd
  FROM win WHERE cnt = {_BOLL_W})
SELECT CAST(COUNT(*) AS BIGINT) AS n_evaluated,
       CAST(SUM(CASE WHEN CAST(close AS DOUBLE) > mean + 2 * sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_breakout_up,
       CAST(SUM(CASE WHEN CAST(close AS DOUBLE) < mean - 2 * sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_breakout_down,
       ROUND(CAST(AVG(CAST(ROUND(4 * sd, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS avg_band_width
FROM full_w
"""

QUERIES["q_bollinger_bands"] = QuerySpec(
    q_bollinger_bands,
    Q_BOLL_SQL,
    "Bollinger bands (7-day, 2-sigma, out-of-sample frame) over the "
    "daily value series with breakout accounting",
)


# --------------------------------- RSI (14-day, simple averages)
# delta = close - lag(close); 14-day simple-average gains/losses
# (not Wilder's recursion — a running recurrence doesn't distribute;
# the simple-average variant is the standard batch form); RSI = 100 -
# 100/(1 + ag/al), pinned to 100 when al = 0. Decimal window sums.

_RSI_W = 14


def q_rsi_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.avg("value"), 6).cast("decimal(18,6)").alias("close")
    )
    wlag = Window.orderBy("day")
    d = daily.withColumn(
        "delta", F.col("close") - F.lag("close", 1).over(wlag)
    ).where(F.col("delta").isNotNull())
    d = d.withColumn(
        "gain", F.greatest(F.col("delta"), F.lit(0).cast("decimal(18,6)"))
    ).withColumn(
        "loss", F.greatest(-F.col("delta"), F.lit(0).cast("decimal(18,6)"))
    )
    w = Window.orderBy("day").rowsBetween(-(_RSI_W - 1), 0)
    r = (
        d.withColumn("cnt", F.count(F.lit(1)).over(w))
        .withColumn("ag", F.sum("gain").over(w).cast("decimal(38,6)"))
        .withColumn("al", F.sum("loss").over(w).cast("decimal(38,6)"))
        .where(F.col("cnt") == _RSI_W)
    )
    rsi = F.when(F.col("al") == 0, F.lit(100.0)).otherwise(
        100.0
        - 100.0
        / (1.0 + F.col("ag").cast("double") / F.col("al").cast("double"))
    )
    r = r.withColumn("rsi_d", F.round(rsi, 6).cast("decimal(18,6)"))
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_evaluated"),
        F.sum((F.col("rsi_d") > 70).cast("int")).cast("long").alias("n_overbought"),
        F.sum((F.col("rsi_d") < 30).cast("int")).cast("long").alias("n_oversold"),
        F.round(F.avg("rsi_d").cast("double"), 6).alias("avg_rsi"),
        F.max_by(F.col("rsi_d").cast("double"), F.col("day")).alias("last_rsi"),
    )


Q_RSI_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(AVG(value), 6) AS DECIMAL(18,6)) AS close
  FROM events GROUP BY 1),
d AS (
  SELECT day, close - LAG(close, 1) OVER (ORDER BY day) AS delta
  FROM daily),
g AS (
  SELECT day,
         GREATEST(delta, CAST(0 AS DECIMAL(18,6))) AS gain,
         GREATEST(-delta, CAST(0 AS DECIMAL(18,6))) AS loss
  FROM d WHERE delta IS NOT NULL),
win AS (
  SELECT day,
         COUNT(*) OVER w AS cnt,
         CAST(SUM(gain) OVER w AS DECIMAL(38,6)) AS ag,
         CAST(SUM(loss) OVER w AS DECIMAL(38,6)) AS al
  FROM g
  WINDOW w AS (ORDER BY day ROWS BETWEEN {_RSI_W - 1} PRECEDING AND CURRENT ROW)),
rsi AS (
  SELECT day,
         CAST(ROUND(CASE WHEN al = 0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + CAST(ag AS DOUBLE) / CAST(al AS DOUBLE))
              END, 6) AS DECIMAL(18,6)) AS rsi_d
  FROM win WHERE cnt = {_RSI_W})
SELECT CAST(COUNT(*) AS BIGINT) AS n_evaluated,
       CAST(SUM(CASE WHEN rsi_d > 70 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overbought,
       CAST(SUM(CASE WHEN rsi_d < 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversold,
       ROUND(CAST(AVG(rsi_d) AS DOUBLE), 6) AS avg_rsi,
       CAST(MAX_BY(rsi_d, day) AS DOUBLE) AS last_rsi
FROM rsi
"""

QUERIES["q_rsi_simple"] = QuerySpec(
    q_rsi_simple,
    Q_RSI_SQL,
    "14-day simple-average RSI over the daily value series with "
    "overbought/oversold accounting — the momentum oscillator",
)

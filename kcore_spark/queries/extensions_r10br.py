"""Round-10 surface extensions, batch BR (SURVEY §2.3 N r10): the
reliability-engineering block over the event stream — MTBF/MTTR
(mean time between per-user 'error' events, and mean time from an
error to the user's next healthy event), daily availability (share
of observed user-time not in an error-to-recovery window), and
error-burst detection (maximal error runs with ≤5-minute gaps,
counted when ≥3 long — the alert-storm table). Completes the SRE
family next to q_slo_burn_rate and q_apdex_score.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: whole-second gaps; integer run ids from partitioned
cumulative sums; pinned-decimal gap averages.
Scale: every window is PARTITIONED by user; daily rollups are
calendar-bounded; no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_BURST_GAP = 300  # seconds
_RECOVERY_CAP = 3600


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
    )


_EV_SQL = """
  SELECT user_id, event_id, event_type,
         epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS t
  FROM events
"""


# ----------------------------------------------------------- MTBF/MTTR


def q_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    # MTBF: gaps between consecutive errors within a user
    errs = ev.where(F.col("event_type") == "error")
    we = Window.partitionBy("user_id").orderBy("t", "event_id")
    mtbf = (
        errs.withColumn("gap", F.col("t") - F.lag("t").over(we))
        .where(F.col("gap").isNotNull())
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            (
                F.sum(F.col("gap").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mtbf_s"),
        )
    )
    # MTTR: error -> next event of any healthy type for that user
    flagged = ev.withColumn("nxt_t", F.lead("t").over(w)).withColumn(
        "nxt_type", F.lead("event_type").over(w)
    )
    rec = flagged.where(
        (F.col("event_type") == "error")
        & F.col("nxt_t").isNotNull()
        & (F.col("nxt_type") != "error")
    ).select((F.col("nxt_t") - F.col("t")).alias("ttr"))
    mttr = rec.agg(
        F.count(F.lit(1)).cast("long").alias("n_recoveries"),
        (
            F.sum(F.col("ttr").cast("decimal(28,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mttr_s"),
    )
    return mtbf.crossJoin(mttr).select(
        "n_intervals",
        F.round("mtbf_s", 6).alias("mtbf_s"),
        "n_recoveries",
        F.round("mttr_s", 6).alias("mttr_s"),
    )


Q_MTBF_SQL = f"""
WITH ev AS ({_EV_SQL}),
errs AS (
  SELECT t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
  FROM ev WHERE event_type = 'error'),
mtbf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(CAST(gap AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS mtbf_s
  FROM errs WHERE gap IS NOT NULL),
flagged AS (
  SELECT event_type, t,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nxt_t,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)
             AS nxt_type
  FROM ev),
mttr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_recoveries,
         CAST(SUM(CAST(nxt_t - t AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS mttr_s
  FROM flagged
  WHERE event_type = 'error' AND nxt_t IS NOT NULL AND nxt_type <> 'error')
SELECT n_intervals, ROUND(mtbf_s, 6) AS mtbf_s,
       n_recoveries, ROUND(mttr_s, 6) AS mttr_s
FROM mtbf CROSS JOIN mttr
"""

QUERIES["q_mtbf_mttr"] = QuerySpec(
    q_mtbf_mttr,
    Q_MTBF_SQL,
    "MTBF between per-user errors + MTTR to the next healthy event — "
    "partitioned lags/leads, decimal gap sums",
)


# --------------------------------------------------------- availability
# Down-time = error -> next event, capped at 1h; observed time per
# user-day approximated by last−first event. Daily availability =
# 1 − Σdown/Σobserved.


def q_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    down = (
        ev.withColumn("nxt_t", F.lead("t").over(w))
        .where((F.col("event_type") == "error") & F.col("nxt_t").isNotNull())
        .select(
            F.to_date(F.from_unixtime("t")).alias("d"),
            F.least(F.col("nxt_t") - F.col("t"), F.lit(_RECOVERY_CAP)).alias("dn"),
        )
        .groupBy("d")
        .agg(F.sum(F.col("dn").cast("decimal(28,0)")).cast("double").alias("down_s"))
    )
    obs = (
        ev.groupBy("user_id", F.to_date(F.from_unixtime("t")).alias("d"))
        .agg((F.max("t") - F.min("t")).alias("span"))
        .groupBy("d")
        .agg(
            F.sum(F.col("span").cast("decimal(28,0)")).cast("double").alias("obs_s")
        )
    )
    j = obs.join(down, "d", "left").na.fill({"down_s": 0.0})
    return j.select(
        F.unix_timestamp(F.col("d").cast("timestamp")).alias("day_epoch"),
        F.round("obs_s", 1).alias("observed_s"),
        F.round("down_s", 1).alias("down_s"),
        F.round(1.0 - F.col("down_s") / F.col("obs_s"), 6).alias("availability"),
    ).orderBy("day_epoch")


Q_AVAIL_SQL = f"""
WITH ev AS ({_EV_SQL}),
down AS (
  SELECT CAST(to_timestamp(t) AS DATE) AS d,
         SUM(CAST(LEAST(nxt_t - t, {_RECOVERY_CAP}) AS DECIMAL(28,0))) AS down_s
  FROM (
    SELECT event_type, t,
           LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nxt_t
    FROM ev)
  WHERE event_type = 'error' AND nxt_t IS NOT NULL
  GROUP BY 1),
obs AS (
  SELECT d, SUM(CAST(span AS DECIMAL(28,0))) AS obs_s
  FROM (
    SELECT user_id, CAST(to_timestamp(t) AS DATE) AS d, MAX(t) - MIN(t) AS span
    FROM ev GROUP BY 1, 2)
  GROUP BY d)
SELECT CAST(epoch(CAST(obs.d AS TIMESTAMP)) AS BIGINT) AS day_epoch,
       ROUND(CAST(obs_s AS DOUBLE), 1) AS observed_s,
       ROUND(COALESCE(CAST(down_s AS DOUBLE), 0.0), 1) AS down_s,
       ROUND(1.0 - COALESCE(CAST(down_s AS DOUBLE), 0.0)
                   / CAST(obs_s AS DOUBLE), 6) AS availability
FROM obs LEFT JOIN down ON obs.d = down.d
ORDER BY day_epoch
"""

QUERIES["q_availability"] = QuerySpec(
    q_availability,
    Q_AVAIL_SQL,
    "daily availability from capped error-to-recovery windows over "
    "observed user-time — partitioned leads, daily rollup",
)


# --------------------------------------------------------- error bursts
# Runs of per-user errors with gaps <= 300 s; burst id = cumulative
# count of run STARTS (partitioned cumsum); report runs of length >= 3.


def q_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).where(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.withColumn(
        "is_start",
        (
            F.lag("t").over(w).isNull()
            | ((F.col("t") - F.lag("t").over(w)) > _BURST_GAP)
        ).cast("long"),
    )
    wc = Window.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = marked.withColumn("run_id", F.sum("is_start").over(wc))
    lens = runs.groupBy("user_id", "run_id").agg(F.count(F.lit(1)).alias("len"))
    agg = lens.where(F.col("len") >= 3).agg(
        F.count(F.lit(1)).cast("long").alias("n_bursts"),
        (
            F.sum(F.col("len").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_len"),
        F.max("len").cast("long").alias("max_len"),
    )
    return agg.select(
        "n_bursts", F.round("avg_len", 6).alias("avg_len"), "max_len"
    )


Q_BURSTS_SQL = f"""
WITH ev AS ({_EV_SQL}),
marked AS (
  SELECT user_id, t, event_id,
         CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   > {_BURST_GAP}
              THEN 1 ELSE 0 END AS is_start
  FROM ev WHERE event_type = 'error'),
runs AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked),
lens AS (SELECT user_id, run_id, COUNT(*) AS len FROM runs GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bursts,
       ROUND(CAST(SUM(CAST(len AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 6)
           AS avg_len,
       CAST(MAX(len) AS BIGINT) AS max_len
FROM lens WHERE len >= 3
"""

QUERIES["q_error_bursts"] = QuerySpec(
    q_error_bursts,
    Q_BURSTS_SQL,
    "error-burst runs (gap <= 5 min, length >= 3) per user — "
    "partitioned run ids via cumulative start marks",
)

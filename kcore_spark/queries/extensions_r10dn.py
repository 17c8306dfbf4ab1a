"""Round-10 surface extensions, batch DN (SURVEY §2.3 N r10): the
retry-analytics block — the request-level half of the SRE family
(q_mtbf_mttr / q_error_bursts / q_slo_burn_rate work at the
user/window level). Retry amplification (events of the same type by
the same user within 60s of an error = retries; how much extra load
does each error generate?), retry success (does the retry's NEXT
event succeed — is retrying actually helping?), and thundering-herd
minutes (cross-USER error spikes: minutes whose error count exceeds
mean + 3 sd — the correlated-failure signature per-user bursts miss).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: whole-second gaps; integer counts; the herd threshold is
a rounded mean+3sd from decimal minute-count moments.
Scale: retry logic is user-partitioned lags; herd minutes fold to the
calendar-bounded minute curve with a 1-row threshold broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_RETRY_S = 60


def _seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("t"),
        "event_type",
    )


_SEQ_SQL = """
  ev AS (
    SELECT user_id, event_id,
           epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS t,
           event_type
    FROM events)
"""


def q_retry_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A retry = any event within 60s after the same user's error.
    Amplification = retries per error, by the retried event type."""
    s = _seq(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = (
        s.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_t", F.lag("t").over(w))
        .withColumn(
            "is_retry",
            (
                (F.col("prev_type") == "error")
                & (F.col("t") - F.col("prev_t") <= _RETRY_S)
            ).cast("long"),
        )
    )
    errors = s.where(F.col("event_type") == "error").count()
    per_type = flagged.where(F.col("is_retry") == 1).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_retries")
    )
    tot = per_type.agg(F.sum("n_retries").cast("long").alias("all_retries"))
    return (
        per_type.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_retries",
            F.lit(errors).alias("n_errors"),
            F.round(F.col("n_retries") / F.lit(float(errors)), 6).alias(
                "amplification"
            ),
            F.round(
                F.col("all_retries") / F.lit(float(errors)), 6
            ).alias("total_amplification"),
        )
        .orderBy("event_type")
    )


Q_AMPL_SQL = f"""
WITH {_SEQ_SQL},
flagged AS (
  SELECT event_type,
         CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY t, event_id) = 'error'
               AND t - LAG(t) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) <= {_RETRY_S}
              THEN 1 ELSE 0 END AS is_retry
  FROM ev),
errors AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_errors FROM ev
  WHERE event_type = 'error'),
per_type AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_retries
  FROM flagged WHERE is_retry = 1 GROUP BY event_type),
tot AS (SELECT CAST(SUM(n_retries) AS BIGINT) AS all_retries FROM per_type)
SELECT event_type, n_retries, n_errors,
       ROUND(n_retries / CAST(n_errors AS DOUBLE), 6) AS amplification,
       ROUND(all_retries / CAST(n_errors AS DOUBLE), 6)
           AS total_amplification
FROM per_type CROSS JOIN errors CROSS JOIN tot
ORDER BY event_type
"""

QUERIES["q_retry_amplification"] = QuerySpec(
    q_retry_amplification,
    Q_AMPL_SQL,
    "retry amplification: follow-up events within 60s of an error, per "
    "retried type — user-partitioned lags",
)


def q_retry_success(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Of error->retry pairs, how often is the retry itself non-error,
    and how often does the user's NEXT event after the retry succeed?"""
    s = _seq(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = (
        s.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_t", F.lag("t").over(w))
        .withColumn("next_type", F.lead("event_type").over(w))
        .where(
            (F.col("prev_type") == "error")
            & (F.col("t") - F.col("prev_t") <= _RETRY_S)
        )
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_retries"),
        F.sum((F.col("event_type") != "error").cast("long")).alias(
            "retry_not_error"
        ),
        F.sum(
            (
                F.col("next_type").isNotNull() & (F.col("next_type") != "error")
            ).cast("long")
        ).alias("next_ok"),
    )
    return agg.select(
        "n_retries",
        F.round(
            F.col("retry_not_error") / F.col("n_retries").cast("double"), 6
        ).alias("retry_success_rate"),
        F.round(F.col("next_ok") / F.col("n_retries").cast("double"), 6).alias(
            "next_event_ok_rate"
        ),
    )


Q_RSUCC_SQL = f"""
WITH {_SEQ_SQL},
flagged AS (
  SELECT event_type, next_type
  FROM (
    SELECT user_id, event_id, t, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id) AS prev_type,
           LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_t,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY t, event_id) AS next_type
    FROM ev)
  WHERE prev_type = 'error' AND t - prev_t <= {_RETRY_S})
SELECT CAST(COUNT(*) AS BIGINT) AS n_retries,
       ROUND(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS retry_success_rate,
       ROUND(SUM(CASE WHEN next_type IS NOT NULL AND next_type <> 'error'
                      THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
           AS next_event_ok_rate
FROM flagged
"""

QUERIES["q_retry_success"] = QuerySpec(
    q_retry_success,
    Q_RSUCC_SQL,
    "retry outcomes: immediate success share and next-event health — "
    "user-partitioned lag/lead fold",
)


def q_thundering_herd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minutes whose cross-user error count exceeds mean + 3 sd of the
    minute-level error series; report the top herd minutes."""
    s = _seq(spark, sf_dir).where(F.col("event_type") == "error")
    per_min = s.groupBy((F.floor(F.col("t") / 60) * 60).alias("minute_epoch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_err"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    mom = per_min.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_err").cast("long").alias("s1"),
        F.sum((F.col("n_err") * F.col("n_err")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    sd = F.sqrt((kd * F.col("s2") - F.col("s1").cast("double") ** 2) / (kd * (kd - 1.0)))
    thr = mom.select(F.round(mean + 3.0 * sd, 6).alias("threshold"))
    herd = per_min.crossJoin(F.broadcast(thr)).where(
        F.col("n_err").cast("double") > F.col("threshold")
    )
    return herd.select(
        "minute_epoch",
        "n_err",
        "n_users",
        F.round("threshold", 4).alias("threshold"),
    ).orderBy(F.col("n_err").desc(), "minute_epoch").limit(20)


Q_HERD_SQL = f"""
WITH {_SEQ_SQL},
per_min AS (
  SELECT CAST(FLOOR(t / 60) * 60 AS BIGINT) AS minute_epoch,
         CAST(COUNT(*) AS BIGINT) AS n_err,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ev WHERE event_type = 'error' GROUP BY 1),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_err) AS BIGINT) AS s1,
         CAST(SUM(CAST(n_err * n_err AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM per_min),
thr AS (
  SELECT ROUND(CAST(s1 AS DOUBLE) / k
               + 3.0 * SQRT((CAST(k AS DOUBLE) * s2
                             - POWER(CAST(s1 AS DOUBLE), 2))
                            / (CAST(k AS DOUBLE) * (k - 1.0))), 6)
             AS threshold
  FROM mom)
SELECT minute_epoch, n_err, n_users,
       ROUND(threshold, 4) AS threshold
FROM per_min CROSS JOIN thr
WHERE CAST(n_err AS DOUBLE) > threshold
ORDER BY n_err DESC, minute_epoch LIMIT 20
"""

QUERIES["q_thundering_herd"] = QuerySpec(
    q_thundering_herd,
    Q_HERD_SQL,
    "thundering-herd minutes: cross-user error spikes over mean + 3 sd "
    "of the minute curve — 1-row threshold broadcast",
)

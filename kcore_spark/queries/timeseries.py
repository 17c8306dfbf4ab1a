"""Event-sequence and time-series queries (SURVEY §2.3 C/E/I
extensions): funnel conversion and resample-with-forward-fill.

Both are event-analytics staples the reference's declared streaming
data model implies (`/root/reference/README.md:17,27`): sequential
pattern detection (view → click → purchase within bounded delays) and
regular-grid resampling with as-of forward fill (the hypertable
"rollup + gap-fill" shape).

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import asof_join
from kcore_spark.queries import QuerySpec

# -------------------------------------------------- funnel conversion
# Per user: view → first click within 30 min → purchase within 30 min
# of that click. The step joins are per-user interval joins (bounded by
# per-user event counts, shuffled on user_id); counts are integers so
# the result is exact on any engine.


def q_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    step1 = (
        v.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("u", "vid")
        .agg(F.min("cts").alias("first_click"))
    )
    converted = step1.join(
        p,
        (F.col("u") == F.col("pu"))
        & (F.col("pts") > F.col("first_click"))
        & (F.col("pts") <= F.col("first_click") + F.expr("INTERVAL 30 MINUTES")),
        "left_semi",
    )
    # distinct event_id: the events fixture contains duplicate rows
    # (q_events_dedup_first exists for exactly that), and the funnel
    # grain is the view EVENT, not the raw row
    views = v.groupBy(F.col("u").alias("user_id")).agg(
        F.count_distinct("vid").alias("n_views")
    )
    clicked = step1.groupBy(F.col("u").alias("cu2")).agg(
        F.count(F.lit(1)).alias("n_view_click")
    )
    conv = converted.groupBy(F.col("u").alias("pu2")).agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    return (
        views.join(clicked, views.user_id == F.col("cu2"), "left")
        .join(conv, views.user_id == F.col("pu2"), "left")
        .select(
            "user_id",
            "n_views",
            F.coalesce("n_view_click", F.lit(0)).alias("n_view_click"),
            F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
        )
        .where(F.col("n_view_click") > 0)
        .orderBy("user_id")
    )


Q_FUNNEL_SQL = """
WITH v AS (SELECT user_id AS u, ts AS vts, event_id AS vid FROM events WHERE event_type = 'view'),
c AS (SELECT user_id AS cu, ts AS cts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id AS pu, ts AS pts FROM events WHERE event_type = 'purchase'),
step1 AS (
  SELECT u, vid, MIN(cts) AS first_click
  FROM v JOIN c ON u = cu AND cts > vts AND cts <= vts + INTERVAL 30 MINUTE
  GROUP BY u, vid),
converted AS (
  SELECT DISTINCT u, vid FROM step1
  WHERE EXISTS (
    SELECT 1 FROM p
    WHERE pu = u AND pts > first_click AND pts <= first_click + INTERVAL 30 MINUTE))
SELECT v.u AS user_id,
       COUNT(DISTINCT v.vid) AS n_views,
       (SELECT COUNT(*) FROM step1 s WHERE s.u = v.u) AS n_view_click,
       (SELECT COUNT(*) FROM converted cv WHERE cv.u = v.u) AS n_converted
FROM v
GROUP BY v.u
HAVING (SELECT COUNT(*) FROM step1 s WHERE s.u = v.u) > 0
ORDER BY user_id
"""

# -------------------------------------------------- resample + ffill
# Hourly grid over a fixed week, forward-filled with each user's last
# event value at-or-before the grid point — the union-window as-of join
# (operators/relational.py), so the fill is ONE shuffle on user_id, not
# a per-point range join. DuckDB's native ASOF JOIN is the oracle.

_WEEK_START = "2024-01-08 00:00:00"
_WEEK_END = "2024-01-15 00:00:00"


def q_resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select(F.col("user_id").alias("u")).distinct()
    spine = users.select(
        "u",
        F.explode(
            F.sequence(
                F.lit(_WEEK_START).cast("timestamp"),
                F.lit(_WEEK_END).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("grid_ts"),
    )
    obs = ev.select("user_id", "ts", F.col("value").cast("double").alias("obs_value"), "event_id")
    filled = asof_join(
        spine,
        obs,
        left_key="u",
        right_key="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        right_vals=["obs_value"],
        tiebreak="event_id",
        # profiled shape: pair blow-up ratio ~48 (169 grid points × a
        # user's events) — range would pay the quadratic fan-out, the
        # union-window single sort is 2× faster; declared to skip the
        # auto probe
        strategy="union_window",
    )
    return filled.select(
        F.col("u").alias("user_id"),
        F.unix_timestamp("grid_ts").alias("grid_epoch"),
        F.round("obs_value", 6).alias("filled_value"),
    ).orderBy("user_id", "grid_epoch")


Q_RESAMPLE_SQL = f"""
WITH spine AS (
  SELECT u, UNNEST(generate_series(
           TIMESTAMP '{_WEEK_START}', TIMESTAMP '{_WEEK_END}', INTERVAL 1 HOUR)) AS grid_ts
  FROM (SELECT DISTINCT user_id AS u FROM events)),
obs AS (
  SELECT user_id, ts, CAST(value AS DOUBLE) AS obs_value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events)
SELECT spine.u AS user_id,
       CAST(epoch(grid_ts) AS BIGINT) AS grid_epoch,
       ROUND(obs.obs_value, 6) AS filled_value
FROM spine
ASOF JOIN (SELECT * FROM obs WHERE rn = 1) obs
  ON spine.u = obs.user_id AND spine.grid_ts >= obs.ts
ORDER BY user_id, grid_epoch
"""


# -------------------------------------------- rolling z-score anomalies

ZWIN = 20  # trailing window size (rows), excludes the current row


def q_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per event type: each event's
    value against the mean/std of its 20 predecessors (the standard
    streaming-metrics shape). The moments come from exact decimal
    sums over the frame — Σv and Σv² as DECIMAL — so variance =
    (Σv² − (Σv)²/n)/(n−1) is the same algebra on both engines
    bit-for-bit (engine-native stddev uses different incremental
    formulas and drifts in the last ulps). Output: anomaly counts per
    type, so the hash pins every per-row verdict."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-ZWIN, -1)
    )
    dv = F.col("value").cast("decimal(18,6)")
    s1 = F.sum(dv).over(w).cast("double")
    s2 = F.sum((dv * dv).cast("decimal(38,12)")).over(w).cast("double")
    n = F.count(dv).over(w).cast("double")
    var = (s2 - s1 * s1 / n) / (n - 1.0)
    z = (F.col("value") - s1 / n) / F.sqrt(var)
    scored = ev.select(
        "event_type",
        F.when((n >= ZWIN) & (F.sqrt(var) > 0), z).alias("z"),
    )
    return scored.groupBy("event_type").agg(
        F.count("z").alias("n_scored"),
        F.sum(F.when(F.abs("z") > 3.0, 1).otherwise(0)).cast("long").alias("n_anomalies"),
    ).orderBy("event_type")


Q_ROLLING_ZSCORE_SQL = f"""
WITH framed AS (
  SELECT event_type, value,
         CAST(SUM(CAST(value AS DECIMAL(18,6)))
              OVER (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN {ZWIN} PRECEDING AND 1 PRECEDING) AS DOUBLE) AS s1,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12)))
              OVER (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN {ZWIN} PRECEDING AND 1 PRECEDING) AS DOUBLE) AS s2,
         CAST(COUNT(value)
              OVER (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN {ZWIN} PRECEDING AND 1 PRECEDING) AS DOUBLE) AS n
  FROM events),
scored AS (
  SELECT event_type,
         CASE WHEN n >= {ZWIN} AND sqrt((s2 - s1*s1/n)/(n-1.0)) > 0
              THEN (value - s1/n) / sqrt((s2 - s1*s1/n)/(n-1.0)) END AS z
  FROM framed)
SELECT event_type,
       COUNT(z) AS n_scored,
       CAST(SUM(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


# -------------------------------------------------- sequence-pattern regex
# MATCH_RECOGNIZE-style behavioral patterns without the clause (Spark
# has none): each user's event history becomes one ordered symbol
# string (v/c/p/s/e per event, fully tie-broken by (ts, event_id)),
# and patterns are plain regexes over it. One shuffle (groupBy user),
# then per-row regex — the string is bounded by a user's event count,
# and at 100 TB the per-user history that fits MATCH_RECOGNIZE fits
# this. Sorted-struct-array fold, not bare collect_list (whose order
# is partition-dependent).


def q_event_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)  # v c p s e — distinct initials
    packed = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), sym.alias("s")
            ).alias("evt"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("evt")), lambda x: x["s"]
                ),
                "",
            ).alias("seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return packed.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("seq").rlike("vc*p").cast("long")).alias("n_view_then_purchase"),
        F.sum(F.col("seq").rlike("^v").cast("long")).alias("n_start_with_view"),
        F.sum(F.col("seq").rlike("e.*e.*e").cast("long")).alias("n_three_errors"),
        F.sum(F.col("seq").rlike("p[^e]*$").cast("long")).alias("n_purchase_no_later_error"),
        F.sum("n_events").alias("n_events_total"),
    )


Q_EVENT_PATTERN_SQL = """
WITH packed AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq,
         COUNT(*) AS n_events
  FROM events
  GROUP BY user_id)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN regexp_matches(seq, 'vc*p') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_then_purchase,
       CAST(SUM(CASE WHEN regexp_matches(seq, '^v') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_start_with_view,
       CAST(SUM(CASE WHEN regexp_matches(seq, 'e.*e.*e') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_three_errors,
       CAST(SUM(CASE WHEN regexp_matches(seq, 'p[^e]*$') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase_no_later_error,
       CAST(SUM(n_events) AS BIGINT) AS n_events_total
FROM packed
"""


# -------------------------------------------------- cohort retention


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-active
    week, retention = distinct users active k weeks later. Two
    aggregations (first-seen per user, then distinct-per-cell) and a
    broadcast of the per-user cohort table — the standard cohort plan;
    at 100 TB the (user, week) activity table is the only big shuffle
    and it partial-aggregates map-side."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(F.unix_timestamp("ts") / (7 * 86400)).cast("long")
    activity = ev.select("user_id", wk.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = activity.join(F.broadcast(cohorts), "user_id").select(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"), "user_id"
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


Q_COHORT_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / (7 * 86400)) AS BIGINT) AS week
  FROM events),
cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN cohorts USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


# -------------------------------------------------- CUPED variance reduction


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled experiments using pre-experiment data): per
    event_type, how much variance the pre-period covariate removes
    from the post-period metric — θ = cov(x,y)/var(x), reduced
    variance = var(y) − cov²/var(x).

    Every moment (Σx, Σy, Σx², Σy², Σxy) is an exact DECIMAL sum of
    per-user decimal aggregates, so the θ and variance arithmetic runs
    on bit-identical operands on both engines — the experimentation
    math is reproducible to the last digit, which is what you want
    when a launch decision hangs on it. Period boundary = the exact
    midpoint of the event-time range (1-row control-plane aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    bounds = ev.agg(
        ((F.min(es) + F.max(es)) / 2).cast("long").alias("mid")
    )
    val = F.col("value").cast("decimal(18,2)")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", "user_id")
        .agg(
            F.coalesce(F.sum(F.when(es < F.col("mid"), val)), F.lit(0).cast("decimal(18,2)")).alias("x"),
            F.coalesce(F.sum(F.when(es >= F.col("mid"), val)), F.lit(0).cast("decimal(18,2)")).alias("y"),
        )
    )
    mom = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.col("n")
    theta = cov / var_x
    var_cuped = var_y - cov * cov / var_x
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.round(theta, 9).alias("theta"),
        F.round(var_y, 6).alias("var_y"),
        F.round(var_cuped, 6).alias("var_cuped"),
        F.round((F.lit(1.0) - var_cuped / var_y) * 100.0, 6).alias("reduction_pct"),
    ).orderBy("event_type")


Q_CUPED_SQL = """
WITH bounds AS (
  -- FLOOR each epoch before averaging and FLOOR the average: events ts
  -- carries sub-second fractions; Spark's unix_timestamp floors and the
  -- long cast truncates, so the oracle must too (a bare BIGINT cast rounds)
  SELECT CAST(FLOOR((FLOOR(MIN(epoch(CAST(ts AS TIMESTAMP)))) + FLOOR(MAX(epoch(CAST(ts AS TIMESTAMP))))) / 2) AS BIGINT) AS mid
  FROM events),
per_user AS (
  SELECT event_type, user_id,
         COALESCE(SUM(CASE WHEN epoch(CAST(ts AS TIMESTAMP)) < mid
                           THEN CAST(value AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS x,
         COALESCE(SUM(CASE WHEN epoch(CAST(ts AS TIMESTAMP)) >= mid
                           THEN CAST(value AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS y
  FROM events CROSS JOIN bounds
  GROUP BY event_type, user_id),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM per_user
  GROUP BY event_type)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       ROUND(((sxy - sx * sy / n) / n) / ((sxx - sx * sx / n) / n), 9) AS theta,
       ROUND((syy - sy * sy / n) / n, 6) AS var_y,
       ROUND((syy - sy * sy / n) / n
             - ((sxy - sx * sy / n) / n) * ((sxy - sx * sy / n) / n)
               / ((sxx - sx * sx / n) / n), 6) AS var_cuped,
       ROUND((1.0 - ((syy - sy * sy / n) / n
                     - ((sxy - sx * sy / n) / n) * ((sxy - sx * sy / n) / n)
                       / ((sxx - sx * sx / n) / n))
                   / ((syy - sy * sy / n) / n)) * 100.0, 6) AS reduction_pct
FROM mom
ORDER BY event_type
"""


# -------------------------------------------------- multi-touch attribution


def q_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits one unit of
    credit equally across the user's view/click touches in the prior
    30 minutes; credit totals roll up per touch channel.

    The per-touch credit 1/n is rounded then summed as DECIMAL —
    fractional credits are exactly where naive double sums drift under
    re-partitioning, and attribution reports get audited. Join shape:
    per-user interval join (equi key bounds the fan-out) → per-purchase
    touch counts → credit explode — the funnel machinery pointed at
    revenue accounting."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"),
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("tid"),
        F.col("ts").alias("tts"),
    )
    joined = purchases.join(
        touches,
        (F.col("pu") == F.col("tu"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES")),
    )
    # touch count per purchase — distinct touch events (fixture has
    # duplicate rows; the attribution grain is the touch EVENT)
    per_purchase = joined.select("pid", "channel", "tid").distinct()
    counts = per_purchase.groupBy("pid").agg(F.count(F.lit(1)).alias("n_touches"))
    credited = per_purchase.join(counts, "pid").select(
        "channel",
        F.round(F.lit(1.0) / F.col("n_touches"), 12)
        .cast("decimal(24,12)")
        .alias("credit"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches_credited"),
            F.round(F.sum("credit").cast("double"), 6).alias("total_credit"),
        )
        .orderBy("channel")
    )


Q_MULTI_TOUCH_SQL = """
WITH purchases AS (
  SELECT user_id AS pu, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts
  FROM events WHERE event_type = 'purchase'),
touches AS (
  SELECT user_id AS tu, event_type AS channel, event_id AS tid,
         CAST(ts AS TIMESTAMP) AS tts
  FROM events WHERE event_type IN ('view', 'click')),
per_purchase AS (
  SELECT DISTINCT pid, channel, tid
  FROM purchases JOIN touches
    ON pu = tu AND tts < pts AND tts >= pts - INTERVAL 30 MINUTE),
counts AS (SELECT pid, COUNT(*) AS n_touches FROM per_purchase GROUP BY pid),
credited AS (
  SELECT channel,
         CAST(ROUND(1.0 / n_touches, 12) AS DECIMAL(24,12)) AS credit
  FROM per_purchase JOIN counts USING (pid))
SELECT channel, COUNT(*) AS n_touches_credited,
       ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS total_credit
FROM credited
GROUP BY channel
ORDER BY channel
"""


# -------------------------------------------------- transition matrix


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence (lag window per user, fully tie-broken) — the statistic
    behind next-action models and anomaly scoring on behavior. Pure
    integer counts plus a rounded probability derived from them, so
    there is nothing floating to drift. One shuffle (by user) for the
    lag, one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("cur"),
    ).where(F.col("prev").isNotNull())
    counts = steps.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("prev").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(totals), "prev")
        .select(
            "prev",
            "cur",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias("p"),
        )
        .orderBy("prev", "cur")
    )


Q_EVENT_TRANSITIONS_SQL = """
WITH steps AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         event_type AS cur
  FROM events),
counts AS (
  SELECT prev, cur, COUNT(*) AS n
  FROM steps WHERE prev IS NOT NULL
  GROUP BY prev, cur),
totals AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS n_from FROM counts GROUP BY prev)
SELECT c.prev, c.cur, c.n,
       ROUND(CAST(c.n AS DOUBLE) / t.n_from, 6) AS p
FROM counts c JOIN totals t USING (prev)
ORDER BY prev, cur
"""


QUERIES = {
    "q_event_transitions": QuerySpec(
        q_event_transitions,
        Q_EVENT_TRANSITIONS_SQL,
        "first-order Markov transition matrix",
    ),
    "q_multi_touch_attribution": QuerySpec(
        q_multi_touch_attribution,
        Q_MULTI_TOUCH_SQL,
        "linear multi-touch attribution (decimal-exact credits)",
    ),
    "q_cuped_adjustment": QuerySpec(
        q_cuped_adjustment, Q_CUPED_SQL, "CUPED variance reduction (exact moments)"
    ),
    "q_cohort_retention": QuerySpec(
        q_cohort_retention, Q_COHORT_SQL, "weekly cohort retention matrix"
    ),
    "q_event_pattern_regex": QuerySpec(
        q_event_pattern_regex,
        Q_EVENT_PATTERN_SQL,
        "MATCH_RECOGNIZE-style regex over ordered event sequences",
    ),
    "q_rolling_zscore_anomalies": QuerySpec(
        q_rolling_zscore_anomalies,
        Q_ROLLING_ZSCORE_SQL,
        "rolling z-score anomaly detection (exact-decimal moments)",
    ),
    "q_funnel_conversions": QuerySpec(
        q_funnel_conversions, Q_FUNNEL_SQL, "view→click→purchase funnel (sequential pattern)"
    ),
    "q_resample_hourly_ffill": QuerySpec(
        q_resample_hourly_ffill, Q_RESAMPLE_SQL, "hourly resample + as-of forward fill"
    ),
}


# -------------------------------------------------- hypertable rollup


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level continuous-aggregate rollup (the hypertable shape):
    raw events → 1-minute buckets → hourly aggregates computed FROM
    THE MINUTE BUCKETS, never re-touching raw data. The decomposition
    works because every aggregate here is reaggregable (count = sum of
    counts, sum = sum of sums, max = max of maxes) — at 100 TB the
    hourly (and daily, weekly...) grains all derive from the tiny
    minute-grain table, which is what makes continuous aggregates
    cheap to maintain. Decimal sums keep every level exact."""
    ev = load_table(spark, sf_dir, "events")
    minute = (
        ev.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("m"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_v"),
            F.max(F.col("value")).alias("max_v"),
        )
    )
    hourly = (
        minute.groupBy(
            F.date_trunc("hour", F.col("m")).alias("h"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").cast("double").alias("sum_v"),
            F.max("max_v").alias("max_v"),
            F.count(F.lit(1)).alias("n_minute_buckets"),
        )
    )
    return hourly.select(
        F.unix_timestamp("h").alias("hour_epoch"),
        "event_type",
        "n",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("max_v", 6).alias("max_v"),
        "n_minute_buckets",
    ).orderBy("hour_epoch", "event_type")


Q_HYPERTABLE_SQL = """
WITH minute AS (
  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m, event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sum_v,
         MAX(value) AS max_v
  FROM events
  GROUP BY 1, 2),
hourly AS (
  SELECT date_trunc('hour', m) AS h, event_type,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(sum_v) AS DOUBLE) AS sum_v,
         MAX(max_v) AS max_v,
         COUNT(*) AS n_minute_buckets
  FROM minute
  GROUP BY 1, 2)
SELECT CAST(FLOOR(epoch(h)) AS BIGINT) AS hour_epoch, event_type, n,
       ROUND(sum_v, 6) AS sum_v, ROUND(max_v, 6) AS max_v, n_minute_buckets
FROM hourly
ORDER BY hour_epoch, event_type
"""

# -------------------------------------------------- gaps and islands


def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user activity minutes: consecutive-
    minute runs collapse into islands via the classic row_number
    difference trick (minute − rank is constant within a run), then
    islands summarize per user. One shuffle (by user), one window
    pass — the uptime/streak/outage primitive."""
    ev = load_table(spark, sf_dir, "events")
    minutes = ev.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / 60)).cast("long").alias("minute"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("minute")
    grouped = minutes.withColumn(
        "grp", F.col("minute") - F.row_number().over(w)
    )
    islands = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("minute").alias("start_minute"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("len").alias("longest_run"),
            F.min("start_minute").alias("first_minute"),
        )
        .orderBy("user_id")
    )


Q_ISLANDS_SQL = """
WITH minutes AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 60) AS BIGINT) AS minute
  FROM events),
grouped AS (
  SELECT user_id, minute,
         minute - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY minute) AS grp
  FROM minutes),
islands AS (
  SELECT user_id, grp, COUNT(*) AS len, MIN(minute) AS start_minute
  FROM grouped GROUP BY user_id, grp)
SELECT user_id, COUNT(*) AS n_islands, MAX(len) AS longest_run,
       MIN(start_minute) AS first_minute
FROM islands
GROUP BY user_id
ORDER BY user_id
"""

# -------------------------------------------------- cumulative distinct


def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric SQL
    windows can't express directly (COUNT(DISTINCT) OVER a running
    frame is unsupported on both engines). The standard rewrite: flag
    each user's FIRST day (min per user), then a running sum of
    first-appearances — integers end to end."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = ev.select("user_id", day.alias("d")).distinct()
    firsts = daily.groupBy("user_id").agg(F.min("d").alias("first_d"))
    per_day = (
        daily.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(
            firsts.groupBy(F.col("first_d").alias("d")).agg(
                F.count(F.lit(1)).alias("n_new")
            ),
            "d",
            "left",
        )
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.unix_timestamp("d").alias("day_epoch"),
        "n_active",
        "n_new",
        F.sum("n_new").over(w).alias("cum_distinct_users"),
    ).orderBy("day_epoch")


Q_CUMULATIVE_DISTINCT_SQL = """
WITH daily AS (
  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
  FROM events),
firsts AS (SELECT user_id, MIN(d) AS first_d FROM daily GROUP BY user_id),
per_day AS (
  SELECT d, COUNT(*) AS n_active,
         COALESCE((SELECT COUNT(*) FROM firsts f WHERE f.first_d = daily.d), 0) AS n_new
  FROM daily
  GROUP BY d)
SELECT CAST(FLOOR(epoch(d)) AS BIGINT) AS day_epoch, n_active,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(SUM(n_new) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_distinct_users
FROM per_day
ORDER BY day_epoch
"""


QUERIES["q_hypertable_rollup"] = QuerySpec(
    q_hypertable_rollup, Q_HYPERTABLE_SQL, "two-level continuous-aggregate rollup"
)
QUERIES["q_activity_islands"] = QuerySpec(
    q_activity_islands, Q_ISLANDS_SQL, "gaps-and-islands activity runs"
)
QUERIES["q_cumulative_distinct_users"] = QuerySpec(
    q_cumulative_distinct_users,
    Q_CUMULATIVE_DISTINCT_SQL,
    "cumulative distinct users (first-seen rewrite)",
)


# ------------------------------------------------- CUSUM change point


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: daily mean values,
    centered by the series' own global mean, accumulated as a running
    sum — the day where |S| peaks is the most likely level-shift
    point, and the peak magnitude is the shift evidence. All sums are
    decimal-exact before the double surface (order-free, the
    FIXTURES.md rule); one scan, one daily rollup, one window per
    type."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(28,10)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("day_mean", F.col("s").cast("double") / F.col("n"))
    )
    g = Window.partitionBy("event_type")
    seq = Window.partitionBy("event_type").orderBy("d")
    centered = daily.withColumn(
        "dev",
        (
            F.col("day_mean")
            - F.sum(F.col("s")).over(g).cast("double") / F.sum(F.col("n")).over(g)
        ),
    )
    cusum = centered.withColumn(
        "s_cum",
        F.sum(F.col("dev").cast("decimal(28,10)")).over(
            seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("double"),
    )
    peak = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_cum")).desc(), F.col("d").asc()
    )
    return (
        cusum.withColumn("rn", F.row_number().over(peak))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.unix_timestamp("d").alias("change_day_epoch"),
            F.col("s_cum").alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


Q_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         SUM(CAST(value AS DECIMAL(28,10))) AS s, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
centered AS (
  SELECT event_type, d,
         CAST(s AS DOUBLE) / n
           - CAST(SUM(s) OVER (PARTITION BY event_type) AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type) AS dev
  FROM daily),
cusum AS (
  SELECT event_type, d,
         CAST(SUM(CAST(dev AS DECIMAL(28,10))) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s_cum
  FROM centered)
SELECT event_type,
       CAST(FLOOR(epoch(d)) AS BIGINT) AS change_day_epoch,
       s_cum AS peak_cusum
FROM cusum
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(s_cum) DESC, d) = 1
ORDER BY event_type
"""

QUERIES["q_cusum_changepoint"] = QuerySpec(
    q_cusum_changepoint, Q_CUSUM_SQL, "CUSUM level-shift change-point per series"
)


# ------------------------------------------------- windowed EWMA smoothing


def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed EWMA (10-tap, α=0.3) over the daily mean series per
    event type — the smoothing pass a monitoring pipeline runs before
    thresholding. The infinite recursion is truncated to 10 taps so
    the weights are a FIXED multiply-add chain, written in the
    identical order on both engines (bit-stable — the same stance as
    the decimal-sum rule; a true infinite-memory EWMA is inherently
    order-recursive and pins poorly). Emits the final 5 smoothed
    points per type."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(28,10)")).cast("double") / F.count(F.lit(1))).alias("m")
        )
    )
    seq = Window.partitionBy("event_type").orderBy("d")
    alpha = 0.3
    taps = [alpha * (1 - alpha) ** j for j in range(10)]
    expr = F.lit(0.0)
    wsum = F.lit(0.0)
    for j, wj in enumerate(taps):
        x = F.lag("m", j).over(seq)
        expr = expr + F.when(x.isNotNull(), F.lit(wj) * x).otherwise(F.lit(0.0))
        wsum = wsum + F.when(x.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
    sm = daily.withColumn("ewma", expr / wsum).withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy(F.col("d").desc()))
    )
    return (
        sm.where(F.col("rn") <= 5)
        .select("event_type", F.unix_timestamp("d").alias("day_epoch"), "m", "ewma")
        .orderBy("event_type", "day_epoch")
    )


def _ewma_sql():
    alpha = 0.3
    taps = [alpha * (1 - alpha) ** j for j in range(10)]
    num = " + ".join(
        f"CASE WHEN LAG(m, {j}) OVER w IS NOT NULL THEN {w!r} * LAG(m, {j}) OVER w ELSE 0.0 END"
        for j, w in enumerate(taps)
    )
    den = " + ".join(
        f"CASE WHEN LAG(m, {j}) OVER w IS NOT NULL THEN {w!r} ELSE 0.0 END"
        for j, w in enumerate(taps)
    )
    return f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS m
  FROM events GROUP BY 1, 2),
sm AS (
  SELECT event_type, d, m,
         (0.0 + {num}) / (0.0 + {den}) AS ewma,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC) AS rn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d))
SELECT event_type, CAST(FLOOR(epoch(d)) AS BIGINT) AS day_epoch, m, ewma
FROM sm WHERE rn <= 5
ORDER BY event_type, day_epoch
"""


QUERIES["q_ewma_smoothing"] = QuerySpec(
    q_ewma_smoothing, _ewma_sql(), "10-tap windowed EWMA smoothing"
)

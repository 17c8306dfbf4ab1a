"""Round-10 surface extensions, batch CS (SURVEY §2.3 N r10): the
experimentation block, fourth wave — novelty-effect detection (does
the daily treatment lift TREND toward zero? OLS of the per-day lift on
exposure day), differential attrition (do arms retain users at the
same rate week over week? the silent killer of A/B validity), and the
peeking path (the cumulative daily z statistic with its first naive
1.96 crossing — what an impatient experimenter would have "found",
next to q_sprt_stopping which does sequential testing properly).
Arms are pinned: user_id % 2.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: daily per-arm counts are exact integers; lifts and z
paths are doubles computed identically; OLS moments rounded and
decimal-summed; the crossing day uses a pinned earliest-day argmin.
Scale: one events scan folds to (day, arm) counts — the calendar-
bounded curve; everything after is curve algebra (adjudicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}


def _daily_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (day, arm): active users and purchasers."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        F.to_date("ts").alias("d"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
        "user_id",
        "event_type",
    )
    return ev.groupBy("d", "arm").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("long")
        .alias("n_buyers"),
    )


_DAILY_ARMS_SQL = """
  da AS (
    SELECT CAST(ts AS DATE) AS d, CAST(user_id % 2 AS INT) AS arm,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT) AS n_buyers
    FROM events GROUP BY 1, 2)
"""


def _lift_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    da = _daily_arms(spark, sf_dir)
    t = da.where(F.col("arm") == 1).select(
        "d",
        (F.col("n_buyers") / F.col("n_users").cast("double")).alias("rt"),
        F.col("n_users").alias("nt"),
    )
    c = da.where(F.col("arm") == 0).select(
        F.col("d").alias("dc"),
        (F.col("n_buyers") / F.col("n_users").cast("double")).alias("rc"),
        F.col("n_users").alias("nc"),
    )
    j = t.join(c, t.d == c.dc)
    w = Window.orderBy("d")
    return j.select(
        F.row_number().over(w).cast("double").alias("x"),
        (F.col("rt") - F.col("rc")).alias("lift"),
        "rt",
        "rc",
        "nt",
        "nc",
        "d",
    )


_LIFT_SQL = """
  lifts AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY t.d) AS DOUBLE) AS x,
           t.rt - c.rc AS lift, t.rt AS rt, c.rc AS rc,
           t.nt AS nt, c.nc AS nc, t.d AS d
    FROM (SELECT d, n_buyers / CAST(n_users AS DOUBLE) AS rt,
                 n_users AS nt FROM da WHERE arm = 1) t
    JOIN (SELECT d, n_buyers / CAST(n_users AS DOUBLE) AS rc,
                 n_users AS nc FROM da WHERE arm = 0) c
      ON t.d = c.d)
"""


def q_novelty_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _lift_series(spark, sf_dir)
    mom = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("x", 1).cast("decimal(38,1)")).cast("double").alias("sx"),
        F.sum(F.round("lift", 10).cast("decimal(38,10)")).cast("double").alias(
            "sy"
        ),
        F.sum(F.round(F.col("x") * F.col("x"), 1).cast("decimal(38,1)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("lift"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum(
            F.round(F.col("lift") * F.col("lift"), 10).cast("decimal(38,10)")
        )
        .cast("double")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / nd
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / nd
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / nd
    slope = sxy_c / sxx_c
    resid_var = (syy_c - slope * sxy_c) / (nd - 2.0)
    se = F.sqrt(resid_var / sxx_c)
    t_stat = slope / se
    return mom.select(
        F.col("n").alias("n_days"),
        F.round(F.col("sy") / nd, 6).alias("mean_lift"),
        F.round(slope, 8).alias("lift_trend_per_day"),
        F.round(t_stat, 6).alias("t_trend"),
        F.round(2.0 * (1.0 - _phi(F.abs(t_stat))), 6).alias("p_approx"),
    )


_TN = (
    "((sxy - sx * sy / n) / (sxx - sx * sx / n))"
    " / SQRT((((syy - sy * sy / n)"
    "          - ((sxy - sx * sy / n) / (sxx - sx * sx / n))"
    "            * (sxy - sx * sy / n)) / (n - 2.0))"
    "        / (sxx - sx * sx / n))"
)
Q_NOVELTY_SQL = f"""
WITH {_DAILY_ARMS_SQL},
{_LIFT_SQL},
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 1) AS DECIMAL(38,1))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(lift, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 1) AS DECIMAL(38,1))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(x * lift, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS sxy,
         CAST(SUM(CAST(ROUND(lift * lift, 10) AS DECIMAL(38,10))) AS DOUBLE)
             AS syy
  FROM lifts)
SELECT n AS n_days,
       ROUND(sy / n, 6) AS mean_lift,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 8)
           AS lift_trend_per_day,
       ROUND({_TN}, 6) AS t_trend,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_TN})")}), 6) AS p_approx
FROM mom
"""

QUERIES["q_novelty_trend"] = QuerySpec(
    q_novelty_trend,
    Q_NOVELTY_SQL,
    "novelty-effect screen: OLS trend of the daily treatment lift with "
    "its t — calendar-bounded lift series",
)


def q_ab_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention by arm: share of week-w actives seen
    again in week w+1; plus the pooled difference z."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        F.floor(F.datediff(F.to_date("ts"), F.lit("1995-01-01")) / 7)
        .cast("long")
        .alias("wk"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
        "user_id",
    ).distinct()
    nxt = ev.select(
        (F.col("wk") - 1).alias("wk2"),
        F.col("arm").alias("arm2"),
        F.col("user_id").alias("uid2"),
    )
    ret = ev.join(
        nxt,
        (F.col("wk") == F.col("wk2"))
        & (F.col("arm") == F.col("arm2"))
        & (F.col("user_id") == F.col("uid2")),
        "left",
    ).select("wk", "arm", "user_id", F.col("uid2").isNotNull().alias("retained"))
    per = ret.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_user_weeks"),
        F.sum(F.col("retained").cast("long")).alias("n_retained"),
    )
    a = per.where(F.col("arm") == 1).select(
        F.col("n_user_weeks").alias("n1"), F.col("n_retained").alias("r1")
    )
    b = per.where(F.col("arm") == 0).select(
        F.col("n_user_weeks").alias("n0"), F.col("n_retained").alias("r0")
    )
    j = a.crossJoin(F.broadcast(b))
    p1 = F.col("r1") / F.col("n1").cast("double")
    p0 = F.col("r0") / F.col("n0").cast("double")
    pp = (F.col("r1") + F.col("r0")) / (F.col("n1") + F.col("n0")).cast("double")
    z = (p1 - p0) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n0"))
    )
    return j.select(
        "n1",
        "n0",
        F.round(p1, 6).alias("retention_treat"),
        F.round(p0, 6).alias("retention_ctrl"),
        F.round(z, 6).alias("z_attrition"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_two_sided"),
    )


_ZA = (
    "((r1 / CAST(n1 AS DOUBLE)) - (r0 / CAST(n0 AS DOUBLE)))"
    " / SQRT(((r1 + r0) / CAST(n1 + n0 AS DOUBLE))"
    "        * (1.0 - (r1 + r0) / CAST(n1 + n0 AS DOUBLE))"
    "        * (1.0 / n1 + 1.0 / n0))"
)
Q_ATTRITION_SQL = f"""
WITH ev AS (
  SELECT DISTINCT
         CAST(FLOOR(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))
                    / 7.0) AS BIGINT) AS wk,
         CAST(user_id % 2 AS INT) AS arm, user_id
  FROM events),
ret AS (
  SELECT e.wk, e.arm, e.user_id,
         n.user_id IS NOT NULL AS retained
  FROM ev e
  LEFT JOIN ev n
    ON n.wk = e.wk + 1 AND n.arm = e.arm AND n.user_id = e.user_id),
per AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS nw,
         CAST(SUM(CASE WHEN retained THEN 1 ELSE 0 END) AS BIGINT) AS nr
  FROM ret GROUP BY arm),
j AS (
  SELECT a.nw AS n1, a.nr AS r1, b.nw AS n0, b.nr AS r0
  FROM (SELECT * FROM per WHERE arm = 1) a
  CROSS JOIN (SELECT * FROM per WHERE arm = 0) b)
SELECT n1, n0,
       ROUND(r1 / CAST(n1 AS DOUBLE), 6) AS retention_treat,
       ROUND(r0 / CAST(n0 AS DOUBLE), 6) AS retention_ctrl,
       ROUND({_ZA}, 6) AS z_attrition,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_ZA})")}), 6)
           AS p_two_sided
FROM j
"""

QUERIES["q_ab_attrition"] = QuerySpec(
    q_ab_attrition,
    Q_ATTRITION_SQL,
    "differential attrition: week-over-week retention by arm with the "
    "pooled two-proportion z — user-week self-join on (week+1, arm)",
)


def q_peeking_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative two-proportion z after each day; report the final z
    and the FIRST day where |z| > 1.96 (what naive peeking would stop
    on), if any."""
    s = _lift_series(spark, sf_dir)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = s.select(
        "d",
        F.sum(F.round(F.col("rt") * F.col("nt"), 6).cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("b1"),
        F.sum("nt").over(w).cast("double").alias("m1"),
        F.sum(F.round(F.col("rc") * F.col("nc"), 6).cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("b0"),
        F.sum("nc").over(w).cast("double").alias("m0"),
        F.row_number().over(Window.orderBy("d")).alias("day_idx"),
    )
    p1 = F.col("b1") / F.col("m1")
    p0 = F.col("b0") / F.col("m0")
    pp = (F.col("b1") + F.col("b0")) / (F.col("m1") + F.col("m0"))
    z = (p1 - p0) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("m1") + 1.0 / F.col("m0"))
    )
    path = cum.select("day_idx", F.round(z, 6).alias("z"))
    final = path.agg(
        F.max("day_idx").cast("long").alias("n_days"),
        F.max(F.struct(F.col("day_idx"), F.col("z")))["z"].alias("final_z"),
    )
    cross = path.where(F.abs(F.col("z")) > 1.96).agg(
        F.min("day_idx").cast("long").alias("first_crossing_day"),
        F.count(F.lit(1)).cast("long").alias("n_days_beyond_196"),
    )
    return final.crossJoin(F.broadcast(cross)).select(
        "n_days",
        "final_z",
        "first_crossing_day",
        "n_days_beyond_196",
        (F.col("n_days_beyond_196") > 0).alias("naive_peek_would_stop"),
    )


Q_PEEK_SQL = f"""
WITH {_DAILY_ARMS_SQL},
{_LIFT_SQL},
cum AS (
  SELECT d,
         CAST(SUM(CAST(ROUND(rt * nt, 6) AS DECIMAL(38,6)))
              OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS b1,
         CAST(SUM(nt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS m1,
         CAST(SUM(CAST(ROUND(rc * nc, 6) AS DECIMAL(38,6)))
              OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS b0,
         CAST(SUM(nc) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS m0,
         ROW_NUMBER() OVER (ORDER BY d) AS day_idx
  FROM lifts),
path AS (
  SELECT day_idx,
         ROUND(((b1 / m1) - (b0 / m0))
               / SQRT(((b1 + b0) / (m1 + m0))
                      * (1.0 - (b1 + b0) / (m1 + m0))
                      * (1.0 / m1 + 1.0 / m0)), 6) AS z
  FROM cum),
final AS (
  SELECT CAST(MAX(day_idx) AS BIGINT) AS n_days,
         ARG_MAX(z, day_idx) AS final_z
  FROM path),
cross_t AS (
  SELECT CAST(MIN(day_idx) AS BIGINT) AS first_crossing_day,
         CAST(COUNT(*) AS BIGINT) AS n_days_beyond_196
  FROM path WHERE ABS(z) > 1.96)
SELECT n_days, final_z, first_crossing_day, n_days_beyond_196,
       n_days_beyond_196 > 0 AS naive_peek_would_stop
FROM final CROSS JOIN cross_t
"""

QUERIES["q_peeking_path"] = QuerySpec(
    q_peeking_path,
    Q_PEEK_SQL,
    "peeking-bias path: cumulative daily two-proportion z with the "
    "first naive 1.96 crossing — calendar-bounded prefix sums",
)
